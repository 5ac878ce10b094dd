import time, sys
import numpy as np
import jax, jax.numpy as jnp
import pyscf_tpu
print("devices:", jax.devices(), flush=True)
nao, naux, nocc = 580, 1390, 50
key_b = np.random.RandomState(0)
B = jnp.asarray(key_b.rand(naux, nao, nao) / naux)
B.block_until_ready(); print("B on device (3.7GB)", flush=True)
dm = jnp.asarray(key_b.rand(nao, nao)); dm = dm + dm.T
co = jnp.asarray(key_b.rand(nao, nocc))

def fetch(x):
    return float(jnp.asarray(x).ravel()[0])

from pyscf_tpu.df.df_jk import jk_chunked
t0=time.time(); vj, vk = jax.jit(jk_chunked)(B, dm, co); fetch(vj)
print(f"jk_chunked occ f64: {time.time()-t0:.1f}s", flush=True)
t0=time.time(); vj, vk = jax.jit(lambda B,dm: jk_chunked(B,dm,None))(B, dm); fetch(vj)
print(f"jk_chunked dm f64: {time.time()-t0:.1f}s", flush=True)
# f32
B32 = B.astype(jnp.float32); dm32 = dm.astype(jnp.float32); co32 = co.astype(jnp.float32)
t0=time.time(); vj, vk = jax.jit(jk_chunked)(B32, dm32, co32); fetch(vj)
print(f"jk_chunked occ f32: {time.time()-t0:.1f}s", flush=True)
# eigh f64 580
F = dm + jnp.eye(nao)*3
t0=time.time(); w, v = jnp.linalg.eigh(F); fetch(w)
print(f"eigh f64 580: {time.time()-t0:.1f}s", flush=True)
with jax.default_matmul_precision('highest'):
    t0=time.time(); w32, v32 = jnp.linalg.eigh(F.astype(jnp.float32)); fetch(w32)
print(f"eigh f32 580: {time.time()-t0:.1f}s", flush=True)
print("ALL COMPONENT PROBES PASSED", flush=True)
