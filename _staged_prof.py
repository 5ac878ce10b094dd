import time, numpy as np, jax, jax.numpy as jnp
import pyscf_tpu as pt
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
t0=time.time(); e = mf.kernel(); print("pass1 %.1fs cycles=%s" % (time.time()-t0, mf.scf_cycles), flush=True)
# phase timings on a warm rerun
mol2 = pt.M(atom=BENZENE, basis='def2-svp', verbose=0)
mf2 = mol2.RKS(xc='b3lyp').density_fit(); mf2.conv_tol=1e-8
t0=time.time(); mf2.with_df.build(); print("df %.2fs" % (time.time()-t0), flush=True)
t0=time.time()
from pyscf_tpu.ops.integrals.j1e import hcore_parts
float(hcore_parts(mol2)[0][0,0]); print("hcore %.2fs" % (time.time()-t0), flush=True)
t0=time.time(); mf2.grids.build() if hasattr(mf2, 'grids') else None; print("grids %.2fs" % (time.time()-t0), flush=True)
t0=time.time(); e2 = mf2.kernel(); print("kernel %.2fs E=%.10f" % (time.time()-t0, e2), flush=True)
# fetch latency right now
s = jnp.ones(())
f = jax.jit(lambda a: a + 1.0)
f(s).block_until_ready()
t0=time.time()
for _ in range(10): float(f(s))
print("scalar roundtrip: %.0f ms" % ((time.time()-t0)/10*1e3), flush=True)
