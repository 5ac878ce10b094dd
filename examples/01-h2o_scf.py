"""Basic SCF: RHF, DFT, density fitting."""
import pyscf_tpu as pt

mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
           basis='cc-pvdz', verbose=4)

mf = mol.RHF()
mf.kernel()                 # -76.02676567

mf = mol.RKS(xc='b3lypg').density_fit()
mf.kernel()

print('dipole (Debye):', mf.dip_moment())
