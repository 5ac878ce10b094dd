import numpy as np, time
import pyscf_tpu as pt
from pyscf_tpu.ops.integrals.j2e import int2e_dense
mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587', basis='sto-3g', verbose=0)
t0=time.time(); eri = np.asarray(int2e_dense(mol)); t_new=time.time()-t0
eri_old = np.asarray(mol.intor('int2e'))
print("sto-3g: new %.1fs  max|diff| = %.3e" % (t_new, np.abs(eri-eri_old).max()), flush=True)
mol2 = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587', basis='cc-pvdz', verbose=0)
t0=time.time(); eri2 = np.asarray(int2e_dense(mol2)); t2=time.time()-t0
t0=time.time(); eri2_old = np.asarray(mol2.intor('int2e')); t2o=time.time()-t0
print("cc-pvdz: new %.1fs old %.1fs  max|diff| = %.3e" % (t2, t2o, np.abs(eri2-eri2_old).max()), flush=True)
