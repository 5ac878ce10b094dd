import numpy as np, jax.numpy as jnp, jax
import pyscf_tpu as pt
from pyscf_tpu.scf import fused
BENZENE='''C  0.000000  1.396792  0.000000
C  1.209657  0.698396  0.000000
C  1.209657 -0.698396  0.000000
C  0.000000 -1.396792  0.000000
C -1.209657 -0.698396  0.000000
C -1.209657  0.698396  0.000000
H  0.000000  2.484212  0.000000
H  2.151390  1.242106  0.000000
H  2.151390 -1.242106  0.000000
H  0.000000 -2.484212  0.000000
H -2.151390 -1.242106  0.000000
H -2.151390  1.242106  0.000000'''
mol = pt.M(atom=BENZENE, basis='def2-svp', verbose=0)
mf = mol.RKS(xc='b3lyp').density_fit()
from pyscf_tpu.lib.linalg import canonical_orth
from pyscf_tpu.scf.fused import build_restricted_cycle, _cast_tree
s1e = jnp.asarray(mf.get_ovlp(mol)); h1e = jnp.asarray(mf.get_hcore(mol))
x = canonical_orth(s1e, 1e-8)
dm = mf.get_init_guess(mol)
res = mf._fused_veff()
kind, veff_fn, veff_data = res[:3]; veff_dm_fn = res[3]
nocc = mol.nelectron // 2
seed, cycle, finalize = build_restricted_cycle(nocc, 8, veff_fn, veff_dm_fn)
co = seed(veff_data, h1e, x, dm)
f32 = jnp.float32
d32 = _cast_tree(veff_data, f32)
with jax.default_matmul_precision('highest'):
    co32 = co.astype(f32)
    fh = jnp.zeros((8, mol.nao, mol.nao), f32); eh = jnp.zeros_like(fh)
    for cyc in range(7):
        co32, fh, eh, e_el, gn = cycle(d32, h1e.astype(f32), s1e.astype(f32), x.astype(f32), co32, fh, eh, jnp.int32(cyc))
co = co32.astype(jnp.float64)
fh = jnp.zeros((8, mol.nao, mol.nao)); eh = jnp.zeros_like(fh)
for cyc in range(10):
    co, fh, eh, e_el, gn = cycle(veff_data, h1e, s1e, x, co, fh, eh, jnp.int32(cyc))
    space = 8
    nval = min(cyc + 1, space)
    ef = np.asarray(eh).reshape(space, -1)[:nval]
    G = ef @ ef.T
    # exact numpy solve of the Pulay system
    H = np.zeros((nval+1, nval+1)); H[:nval,:nval] = G
    H[:nval,-1] = H[-1,:nval] = -1.0
    rhs = np.zeros(nval+1); rhs[-1] = -1.0
    try:
        c = np.linalg.solve(H, rhs)[:nval]
    except np.linalg.LinAlgError:
        c = None
    pred = np.linalg.norm(ef.T @ c) if c is not None else np.nan
    best = np.sqrt(np.diagonal(G).min())
    print("cyc %d g=%.3g exact-solve |c|max=%.2g pred|e|=%.2e best|e|=%.2e cond(G)=%.1e" % (
        cyc+1, float(gn), np.abs(c).max() if c is not None else np.nan,
        pred, best, np.linalg.cond(G)), flush=True)
