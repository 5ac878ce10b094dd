"""A quick tour of the method families added in round 3.

Runs on CPU in a couple of minutes:
    python examples/06-methods_tour.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import dev_env  # noqa: F401,E402  (force CPU for examples)
import numpy as np  # noqa: E402

import pyscf_tpu as pt  # noqa: E402

mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
           basis='sto-3g')
mf = mol.RHF()
mf.kernel()
print(f'RHF            {float(mf.e_tot):.8f}')

# --- localized orbitals & population analysis
from pyscf_tpu import lo  # noqa: E402

nocc = mol.nelectron // 2
cocc = np.asarray(mf.mo_coeff)[:, :nocc]
print('NPA charges   ', np.round(lo.npa_charges(mol, mf=mf), 3))
ibos = lo.ibo(mol, cocc)
print('IBOs          ', ibos.shape, '(intrinsic bond orbitals)')

# --- QCISD (exact for 2-electron systems; CH4/Ne goldens in tests)
from pyscf_tpu.cc import QCISD  # noqa: E402

qc = QCISD(mf)
qc.kernel()
print(f'QCISD          {qc.e_tot:.8f}  (+T: {qc.e_tot + qc.qcisd_t():.8f})')

# --- excited states with oscillator strengths
from pyscf_tpu.tdscf import TDA  # noqa: E402

td = TDA(mf)
td.nstates = 3
e_s = td.kernel()
f_s = td.oscillator_strength()
td_t = TDA(mf)
td_t.nstates = 3
td_t.singlet = False
e_t = td_t.kernel()
print('TDA singlets  ', np.round(e_s * 27.2114, 3), 'eV, f =',
      np.round(f_s, 4))
print('TDA triplets  ', np.round(e_t * 27.2114, 3), 'eV')

# --- SMD solvation + D2 dispersion
from pyscf_tpu.scf.dispersion import d2_energy  # noqa: E402
from pyscf_tpu.solvent import smd_for_scf  # noqa: E402

mfs = mol.RHF()
smd_for_scf(mfs, 'water')
e_solv = mfs.kernel()
print(f'SMD(water)     {float(e_solv):.8f}  '
      f'(dG_solv = {(float(e_solv) - float(mf.e_tot)) * 627.509:.2f} '
      'kcal/mol)')
print(f'D2 dispersion  {d2_energy(mol, "b3lypg") * 627.509:.4f} kcal/mol')

# --- DFT+U and linear-response U
from pyscf_tpu.dft import RKSpU  # noqa: E402

mfu = RKSpU(mol, xc='pbe,pbe', U_idx=['O 2p'], U_val=[3.5])
e_u = mfu.kernel()
print(f'PBE+U(O 2p)    {float(e_u):.8f}  (E_U = {mfu._e_u:.6f})')

# --- spinor X2C with spin-orbit coupling
from pyscf_tpu.x2c import x2c1e_spinor_hcore  # noqa: E402

h1 = np.asarray(x2c1e_spinor_hcore(mol))
print('spinor X2C h1 ', h1.shape, 'complex Hermitian:',
      bool(abs(h1 - h1.conj().T).max() < 1e-10))
