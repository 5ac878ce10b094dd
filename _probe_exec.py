import time
import numpy as np
import jax, jax.numpy as jnp
import pyscf_tpu
nao, naux, nocc = 580, 1390, 50
r = np.random.RandomState(0)
# build B ON DEVICE to skip slow h2d
Bk = jax.jit(lambda k: jax.random.uniform(k, (naux, nao, nao), jnp.float64) / naux)
B = Bk(jax.random.PRNGKey(0)); B.block_until_ready()
dm0 = jnp.asarray(r.rand(nao, nao)); dm = dm0 + dm0.T
co = jnp.asarray(r.rand(nao, nocc))
F = dm + jnp.eye(nao) * 3

def timeit(name, f, *a, n=3):
    out = f(*a); jax.block_until_ready(out)
    t0=time.time()
    for _ in range(n):
        out = f(*a)
    x = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(x).ravel()[0])
    print(f"{name}: {(time.time()-t0)/n*1e3:.0f} ms/exec", flush=True)

from pyscf_tpu.df.df_jk import jk_chunked
jkj = jax.jit(jk_chunked)
timeit("jk occ f64", jkj, B, dm, co)
B32, dm32, co32 = B.astype(jnp.float32), dm.astype(jnp.float32), co.astype(jnp.float32)
timeit("jk occ f32", jkj, B32, dm32, co32)
eigh_j = jax.jit(jnp.linalg.eigh)
timeit("eigh f64", eigh_j, F)
timeit("eigh f32", eigh_j, F.astype(jnp.float32))
