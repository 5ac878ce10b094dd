import numpy as np, jax.numpy as jnp, jax
import pyscf_tpu as pt
from pyscf_tpu.scf import hf as hfmod
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
mf.conv_tol = 1e-8
# manual staged loop mirroring _kernel_staged, capturing DIIS state
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
# f32 stage quickly
f32 = jnp.float32
d32 = _cast_tree(veff_data, f32)
with jax.default_matmul_precision('highest'):
    co32 = co.astype(f32)
    fh = jnp.zeros((8, mol.nao, mol.nao), f32); eh = jnp.zeros_like(fh)
    for cyc in range(7):
        co32, fh, eh, e_el, gn = cycle(d32, h1e.astype(f32), s1e.astype(f32), x.astype(f32), co32, fh, eh, jnp.int32(cyc))
co = co32.astype(jnp.float64)
fh = jnp.zeros((8, mol.nao, mol.nao)); eh = jnp.zeros_like(fh)
for cyc in range(12):
    co, fh, eh, e_el, gn = cycle(veff_data, h1e, s1e, x, co, fh, eh, jnp.int32(cyc))
    # recompute the DIIS internals exactly as _diis_extrapolate does
    space = 8
    ef = np.asarray(eh).reshape(space, -1)
    G = ef @ ef.T
    nval = min(cyc + 1, space)
    valid = np.arange(space) < nval
    norms2 = np.diagonal(G).copy()
    best = np.min(np.where(valid, norms2, np.inf))
    valid2 = valid & (norms2 < 1e8 * max(best, 1e-300))
    print("cyc %d E=%.8f g=%.3g norms=%s masked=%s" % (
        cyc+1, float(e_el), float(gn),
        np.array2string(np.sqrt(np.abs(norms2)), precision=1, formatter={'float_kind':lambda v: '%.0e'%v}),
        (~valid2 & valid).sum()), flush=True)
