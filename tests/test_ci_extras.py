"""Spin-orbital CISD (GCISD/UCISD) tests.

Oracles: CISD == FCI for two-electron systems; closed-shell GCISD ==
the spatial-orbital RCISD module; open-shell (UHF reference) runs.
"""
import numpy as np

import pyscf_tpu as pt
from pyscf_tpu import fci
from pyscf_tpu.ci.gcisd import GCISD


def test_gcisd_two_electron_fci():
    mol = pt.M(atom='H 0 0 0; H 0 0 0.74', basis='cc-pvdz')
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    mf.kernel()
    gc = GCISD(mf)
    gc.kernel()
    efci, _ = fci.FCI(mf).kernel()
    assert abs(gc.e_tot - efci) < 1e-9


def test_gcisd_vs_rcisd():
    from pyscf_tpu.ci.cisd_amp import CISD as RCISD
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    mf.kernel()
    rci = RCISD(mf)
    rci.kernel()
    gc = GCISD(mf)
    ec, _ = gc.kernel()
    assert abs(ec - rci.e_corr) < 1e-8


def test_ucisd_open_shell():
    from pyscf_tpu.scf.uhf import UHF
    mol = pt.M(atom='O 0 0 0; H 0 0 0.97', basis='sto-3g', spin=1)
    umf = UHF(mol)
    umf.conv_tol = 1e-11
    umf.kernel()
    gc = GCISD(umf)
    ec, _ = gc.kernel()
    assert -0.1 < ec < 0


def test_rcisd_spatial_vs_det_oracle():
    """Polynomial spatial RCISD (CC-Jacobian sigma) == determinant CISD."""
    from pyscf_tpu.ci.rcisd import RCISD
    from pyscf_tpu.ci.cisd import CISD as DetCISD
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g', verbose=0)
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.kernel()
    ci = RCISD(mf)
    e, _ = ci.kernel()
    d = DetCISD(mf)
    d.kernel()
    assert ci.converged
    assert abs(e - d.e_corr) < 1e-8
    dm = ci.make_rdm1()
    assert abs(np.trace(dm) - mol.nelectron) < 1e-8


def test_rcisd_h4_reference_golden():
    """Reference ci/test/test_cisd.py test_h4 golden (2-electron system:
    CISD == FCI, e_corr = -0.024780739973407784)."""
    from pyscf_tpu.ci.rcisd import RCISD
    mol = pt.M(atom=[['H', (1., -1., 0.)], ['H', (0., -1., -1.)],
                     ['H', (1., -0.5, 0.)], ['H', (0., -1., 1.)]],
               charge=2, basis='3-21g', verbose=0)
    mf = mol.RHF()
    mf.conv_tol = 1e-14
    mf.kernel()
    ci = RCISD(mf)
    e, _ = ci.kernel()
    assert ci.converged
    assert abs(e - (-0.024780739973407784)) < 1e-6
