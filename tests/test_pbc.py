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
    # reference golden (pbc/dft/test/test_krks.py:112), same [17]^3 mesh
    assert abs(e - (-10.221426445656439)) < 1e-6


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



@pytest.mark.slow
def test_kpts_vs_supercell_oracle():
    """2x1x1 KRHF and KRKS-LDA equal the doubled supercell at Gamma
    (the reference's own consistency strategy for BZ-sampling code)."""
    from pyscf_tpu.pbc.tools import super_cell
    from pyscf_tpu.pbc.scf import hf as ghf
    from pyscf_tpu.pbc.scf.khf import KRHF
    from pyscf_tpu.pbc.dft import rks as grks
    from pyscf_tpu.pbc.dft.krks import KRKS
    cell = Cell(mesh=[11] * 3, **DIAMOND).build()
    kpts = cell.make_kpts([2, 1, 1])
    sc = super_cell(cell, [2, 1, 1])
    mfk = KRHF(cell, kpts=kpts)
    mfk.conv_tol = 1e-9
    ek = mfk.kernel()
    mfs = ghf.RHF(sc)
    mfs.conv_tol = 1e-9
    mfs.init_guess = 'hcore'
    es = mfs.kernel()
    assert abs(ek - es / 2) < 1e-8
    mfk2 = KRKS(cell, kpts=kpts, xc='lda,vwn')
    mfk2.conv_tol = 1e-9
    ek2 = mfk2.kernel()
    mfs2 = grks.RKS(sc, xc='lda,vwn')
    mfs2.conv_tol = 1e-9
    mfs2.init_guess = 'hcore'
    es2 = mfs2.kernel()
    assert abs(ek2 - es2 / 2) < 1e-8


@pytest.mark.slow
def test_krks_222_golden():
    """KRKS-LDA 2x2x2 vs reference golden (pbc/dft/test/test_krks.py:121)."""
    from pyscf_tpu.pbc.dft.krks import KRKS
    cell = Cell(mesh=[17] * 3, **DIAMOND).build()
    kpts = cell.make_kpts([2, 2, 2], with_gamma_point=False)
    mf = KRKS(cell, kpts=kpts, xc='lda,vwn')
    mf.conv_tol = 1e-8
    e = mf.kernel()
    assert abs(e - (-11.353643583707452)) < 2e-6


@pytest.mark.slow
def test_diamond_gamma_pbe_gdf():
    """Config 5: diamond Gamma PBE with Gaussian DF (CD factorization) ==
    the exact FFTDF result to the Cholesky tolerance."""
    from pyscf_tpu.pbc.dft import RKS
    cell = Cell(mesh=[15] * 3, **DIAMOND).build()
    mf = RKS(cell, xc='pbe')
    mf.conv_tol = 1e-9
    mf.init_guess = 'hcore'
    e_fft = mf.kernel()
    mf2 = RKS(cell, xc='pbe').density_fit()
    mf2.conv_tol = 1e-9
    mf2.init_guess = 'hcore'
    e_gdf = mf2.kernel()
    assert mf2.converged
    assert abs(e_gdf - e_fft) < 1e-8


@pytest.mark.slow
def test_get_bands_reproduces_scf_eigenvalues():
    """Band interpolation evaluated at the SCF k-points must reproduce
    the converged eigenvalues (including the Ewald exxdiv shift)."""
    from pyscf_tpu.pbc.scf.khf import KRHF
    cell = Cell(mesh=[9] * 3, **DIAMOND).build()
    kpts = cell.make_kpts([2, 1, 1])
    mf = KRHF(cell, kpts=kpts)
    mf.conv_tol = 1e-9
    mf.kernel()
    be, _ = mf.get_bands(kpts)
    for k in range(2):
        assert abs(np.asarray(be[k])
                   - np.asarray(mf.mo_energy[k])).max() < 1e-7
    be2, _ = mf.get_bands(np.array([[0.123, 0.041, -0.07]]))
    assert np.all(np.isfinite(be2[0]))


@pytest.mark.slow
def test_krhf_kgdf_vs_fftdf():
    """k-point Gaussian DF (CD over analytic pair FTs, pbc/df/gdf.py
    KGDF) reproduces the exact FFTDF K-point SCF (reference parity
    target: pbc/df/df.py GDF vs fft.py on the same mesh)."""
    from pyscf_tpu.pbc.scf.khf import KRHF
    cell = Cell(mesh=[15] * 3, **DIAMOND).build()
    kpts = cell.make_kpts([2, 1, 1])
    mf = KRHF(cell, kpts=kpts)
    mf.conv_tol = 1e-9
    e_fft = mf.kernel()
    mf2 = KRHF(cell, kpts=kpts).density_fit()
    mf2.conv_tol = 1e-9
    e_gdf = mf2.kernel()
    assert mf2.converged
    assert abs(e_gdf - e_fft) < 1e-7
