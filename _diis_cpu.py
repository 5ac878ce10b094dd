import time
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
mol = pt.M(atom=BENZENE, basis='def2-svp', verbose=5)
mf = mol.RKS(xc='b3lyp').density_fit()
mf.conv_tol = 1e-8
t0=time.time(); e = mf.kernel()
print("kernel %.1fs E=%.10f conv=%s" % (time.time()-t0, e, mf.converged), flush=True)
