"""DFT golden-value tests vs the reference test suite.

Goldens from reference pyscf/dft/test/test_he.py and test_h2o.py. The
test_h2o goldens predate atom-specific Treutler radii, so those tests
disable ATOM_SPECIFIC_TREUTLER_GRIDS (see reference dft/radi.py:30-37).
"""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.dft import gen_grid, radi

ATOM = 'O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587'


@pytest.fixture(scope='module')
def he():
    return pt.M(atom='He 0 0 0', basis='cc-pvdz', verbose=0)


def _scf(mf, **grid_opts):
    mf.verbose = 0
    mf.init_guess = 'hcore'
    mf.conv_tol = 1e-11
    for k, v in grid_opts.items():
        setattr(mf.grids, k, v)
    return mf.kernel()


def test_he_lda(he):
    # reference dft/test/test_he.py:49
    e = _scf(he.RKS(xc='lda,vwn_rpa'))
    assert abs(e - (-2.8641551904776055)) < 1e-8


def test_he_b88vwn(he):
    # reference dft/test/test_he.py:71
    e = _scf(he.RKS(xc='b88,vwn'))
    assert abs(e - (-2.9670729652962606)) < 1e-8


def test_he_b3lypg(he):
    # reference dft/test/test_he.py:79
    e = _scf(he.RKS(xc='b3lypg'))
    assert abs(e - (-2.9070540942168002)) < 1e-8


@pytest.mark.slow
def test_h2o_b3lypg_gausscheb():
    # reference dft/test/test_h2o.py:119 (gauss_chebyshev radial)
    mol = pt.M(atom=ATOM, basis='6-31g', verbose=0)
    mf = mol.RKS(xc='b3lypg')
    e = _scf(mf, prune=gen_grid.treutler_prune,
             radi_method=radi.gauss_chebyshev,
             atom_grid={'H': (50, 194), 'O': (50, 194)})
    assert abs(e - (-76.384928823070567)) < 1e-8


@pytest.mark.slow
def test_h2o_lda_treutler():
    # reference dft/test/test_h2o.py:95 (golden predates atom-specific xi)
    radi.ATOM_SPECIFIC_TREUTLER_GRIDS = False
    try:
        mol = pt.M(atom=ATOM, basis='6-31g', verbose=0)
        mf = mol.RKS(xc='lda,vwn_rpa')
        e = _scf(mf, prune=gen_grid.treutler_prune,
                 atom_grid={'H': (50, 194), 'O': (50, 194)})
        assert abs(e - (-76.01330948329084)) < 1e-8
    finally:
        radi.ATOM_SPECIFIC_TREUTLER_GRIDS = True


@pytest.mark.slow
def test_h2o_cation_uks_b3lypg():
    # reference dft/test/test_h2o.py:137
    radi.ATOM_SPECIFIC_TREUTLER_GRIDS = False
    try:
        mol = pt.M(atom=ATOM, basis='6-31g', charge=1, spin=1, verbose=0)
        mf = pt.dft.UKS(mol, xc='b3lypg')
        e = _scf(mf, prune=gen_grid.treutler_prune,
                 atom_grid={'H': (50, 194), 'O': (50, 194)})
        assert abs(e - (-75.927304010489976)) < 1e-7
    finally:
        radi.ATOM_SPECIFIC_TREUTLER_GRIDS = True


def test_lebedev_exactness():
    from pyscf_tpu.dft.lebedev import lebedev_grid
    pts, w = lebedev_grid(302)
    assert abs(w.sum() - 1) < 1e-13
    # integral of x^2 y^2 z^2 over unit sphere / (4 pi) = 1/105
    val = (w * pts[:, 0] ** 2 * pts[:, 1] ** 2 * pts[:, 2] ** 2).sum()
    assert abs(val - 1.0 / 105) < 1e-14


def test_grid_nelec(he):
    mf = he.RKS(xc='lda,vwn')
    mf.verbose = 0
    mf.init_guess = 'hcore'
    mf.kernel()
    from pyscf_tpu.dft.numint import NumInt
    n, exc, v = NumInt().nr_rks(he, mf.grids, 'lda,vwn', mf.make_rdm1())
    assert abs(n - 2.0) < 1e-8


@pytest.mark.slow
def test_he_camb3lyp_golden():
    """Range-separated hybrid vs reference golden (dft/test/test_he.py:87)."""
    mol = pt.M(atom='He 0 0 0', basis='cc-pvdz', verbose=0)
    e = pt.dft.RKS(mol, xc='camb3lyp').kernel()
    assert abs(e - (-2.89299475730048)) < 1e-7
    eu = pt.dft.UKS(mol, xc='camb3lyp').kernel()
    assert abs(eu - e) < 1e-9


@pytest.mark.slow
def test_he_gga_goldens():
    """PW91 and XLYP vs reference goldens (dft/test/test_he.py:67,77)."""
    mol = pt.M(atom='He 0 0 0', basis='cc-pvdz', verbose=0)
    e = pt.dft.RKS(mol, xc='pw91,pw91').kernel()
    assert abs(e - (-2.8914066724838849)) < 5e-7
    e = pt.dft.RKS(mol, xc='xlyp').kernel()
    assert abs(e - (-2.9045738259332161)) < 1e-7


def test_tpss_consistency():
    """meta-GGA: RKS == UKS for closed shell; H atom near-exact."""
    mol = pt.M(atom='He 0 0 0', basis='sto-3g', verbose=0)
    er = pt.dft.RKS(mol, xc='tpss').kernel()
    eu = pt.dft.UKS(mol, xc='tpss').kernel()
    assert abs(er - eu) < 1e-10
