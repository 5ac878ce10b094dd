"""MC-PDFT tests.

1. Exact identity: for a single-determinant CAS wavefunction the tPBE
   MC-PDFT energy equals the PBE energy functional evaluated at that
   density (on-top translation gives zeta=0, rho/2 each spin).
2. Reference golden: LiH/STO-3G CASSCF(5,2) tPBE = -7.924089707
   (pyscf/mcpdft/test/test_mcpdft.py test_init, delta 1e-6 on their grid).
"""
import numpy as np

import pyscf_tpu as pt
from pyscf_tpu.mcscf import CASCI, CASSCF
from pyscf_tpu import mcpdft
from pyscf_tpu.dft import gen_grid
from pyscf_tpu.dft.numint import NumInt


def test_single_determinant_limit():
    mol = pt.M(atom='He 0 0 0', basis='ccpvdz', verbose=0)
    mf = pt.scf.RHF(mol)
    mf.kernel()
    mc = CASCI(mf, 1, 2)
    mc.kernel()
    e_pdft = mcpdft.energy_tot(mc, 'tPBE')
    dm = np.asarray(mf.make_rdm1())
    h = np.asarray(mf.get_hcore())
    vj = np.asarray(mf.get_jk(mol, dm, with_k=False)[0])
    grids = gen_grid.Grids(mol).build()
    n, exc, _ = NumInt().nr_rks(mol, grids, 'pbe', dm)
    e_ref = (mol.energy_nuc() + np.einsum('ij,ji->', h, dm)
             + 0.5 * np.einsum('ij,ji->', vj, dm) + exc)
    assert abs(e_pdft - e_ref) < 1e-9


def test_lih_tpbe_golden():
    mol = pt.M(atom='Li 0 0 0; H 1.5 0 0', basis='sto3g', verbose=0)
    mf = pt.scf.RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    mc = CASSCF(mf, 5, 2)
    mc.kernel()
    e = mcpdft.PDFT(mc, 'tPBE').kernel()
    # 4e-6 window: reference golden is itself on a finite (level-3) grid
    assert abs(e - -7.924089707) < 5e-6
    # tLDA runs too
    e2 = mcpdft.energy_tot(mc, 'tLDA')
    assert e2 < e + 0.2
