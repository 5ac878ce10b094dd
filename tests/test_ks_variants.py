"""ROKS / GKS / wB97-family goldens vs the reference test suite
(reference dft/test/test_he.py and test_h2o.py)."""
import pytest

import pyscf_tpu as pt
from pyscf_tpu.dft import gen_grid, radi

ATOM = 'O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587'


def test_roks_closed_shell_is_rks():
    mol = pt.M(atom=ATOM, basis='sto-3g', verbose=0)
    m1 = mol.RKS(xc='b3lypg')
    m1.conv_tol = 1e-11
    e1 = m1.kernel()
    m2 = mol.ROKS(xc='b3lypg')
    m2.conv_tol = 1e-11
    e2 = m2.kernel()
    assert abs(e1 - e2) < 1e-10


def test_roks_he_cation_b3lypg():
    # reference dft/test/test_he.py:113 (ROKS on a 1-electron system)
    he1 = pt.M(atom='He 0 0 0', basis='cc-pvdz', charge=1, spin=1,
               verbose=0)
    m = he1.ROKS(xc='b3lypg')
    m.conv_tol = 1e-11
    assert abs(m.kernel() - (-1.9931564410562266)) < 5e-9


def test_wb97_he():
    # reference dft/test/test_he.py:93 (Chai-Head-Gordon 2008 parameters)
    he = pt.M(atom='He 0 0 0', basis='cc-pvdz', verbose=0)
    m = he.RKS(xc='wb97')
    m.conv_tol = 1e-11
    assert abs(m.kernel() - (-2.89430888240579)) < 1e-9


def test_gks_he_wb97_matches_rks():
    # reference dft/test/test_he.py:94: GKS == RKS for a closed shell
    he = pt.M(atom='He 0 0 0', basis='cc-pvdz', verbose=0)
    g = he.GKS(xc='wb97')
    g.conv_tol = 1e-11
    assert abs(g.kernel() - (-2.89430888240579)) < 1e-9


def test_wb97x_he_sane():
    # no stored reference energy for plain wb97x; pin our own value so
    # parameter regressions are caught (RSH machinery itself is verified
    # by the wb97 golden above and the wb97x-v goldens in test_xc_new)
    he = pt.M(atom='He 0 0 0', basis='cc-pvdz', verbose=0)
    m = he.RKS(xc='wb97x')
    m.conv_tol = 1e-11
    assert abs(m.kernel() - (-2.8963687968914136)) < 1e-8


@pytest.mark.slow
def test_roks_h2o_cation_b3lypg():
    # reference dft/test/test_h2o.py:172
    radi.ATOM_SPECIFIC_TREUTLER_GRIDS = False
    try:
        cat = pt.M(atom=ATOM, basis='6-31g', charge=1, spin=1, verbose=0)
        mf = cat.ROKS(xc='b3lypg')
        mf.conv_tol = 1e-11
        mf.grids.prune = gen_grid.treutler_prune
        mf.grids.atom_grid = {'H': (50, 194), 'O': (50, 194)}
        assert abs(mf.kernel() - (-75.926526046608529)) < 1e-8
    finally:
        radi.ATOM_SPECIFIC_TREUTLER_GRIDS = True


@pytest.mark.slow
def test_gks_collinear_equals_uks_golden():
    # collinear GKS relaxes to the UKS solution: reference UKS golden
    # dft/test/test_h2o.py:137 (the reference GKS test's own stationary
    # point is higher in energy; the collinear minimum is the UKS one)
    radi.ATOM_SPECIFIC_TREUTLER_GRIDS = False
    try:
        cat = pt.M(atom=ATOM, basis='6-31g', charge=1, spin=1, verbose=0)
        mg = cat.GKS(xc='b3lypg')
        mg.conv_tol = 1e-11
        mg.grids.prune = gen_grid.treutler_prune
        mg.grids.atom_grid = {'H': (50, 194), 'O': (50, 194)}
        assert abs(mg.kernel() - (-75.927304010489976)) < 1e-8
    finally:
        radi.ATOM_SPECIFIC_TREUTLER_GRIDS = True
