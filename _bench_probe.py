import time, numpy as np, jax
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
print("backend:", jax.default_backend(), flush=True)
t00=time.time()
mol = pt.M(atom=BENZENE, basis='def2-svp', verbose=0)
mf = mol.RKS(xc='b3lyp').density_fit()
mf.conv_tol = 1e-8
e = mf.kernel()
t_cold = time.time()-t00
print(f"cold-ish: E={e:.10f} conv={mf.converged} {t_cold:.1f}s", flush=True)
# warm: fresh Mole (DF cache cleared) = the bench headline protocol
for it in range(2):
    t0=time.time()
    mol2 = pt.M(atom=BENZENE, basis='def2-svp', verbose=0)
    mf2 = mol2.RKS(xc='b3lyp').density_fit(); mf2.conv_tol=1e-8
    e2 = mf2.kernel()
    print(f"warm {it}: E={e2:.10f} {time.time()-t0:.2f}s", flush=True)
