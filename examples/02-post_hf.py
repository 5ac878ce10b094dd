"""Post-HF: MP2, CCSD(T), FCI, CASSCF."""
import pyscf_tpu as pt

mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
           basis='cc-pvdz', verbose=4)
mf = mol.RHF().run()

pt.mp.MP2(mf).kernel()              # -0.20402 (vs golden)
cc = pt.cc.CCSD(mf)
cc.kernel()                          # -0.21334
print('(T):', cc.ccsd_t())           # -0.00306

small = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
             basis='sto-3g', verbose=0)
smf = small.RHF().run()
from pyscf_tpu.fci import FCI
print('FCI:', FCI(smf).kernel()[0])
from pyscf_tpu.mcscf import CASSCF
print('CASSCF(4,4):', CASSCF(smf, 4, 4).kernel()[0])
