"""GPW multigrid (pbc/dft/multigrid.py) vs the single-mesh FFTDF engine.

Reference analog: pyscf/pbc/dft/multigrid/multigrid.py (nr_rks:1069) is
validated there against the single-grid numint path
(pbc/dft/test/test_multigrid.py). Same strategy here:

- J and the LDA SCF energy must match single-mesh FFTDF essentially
  exactly (the level densities are prolongated in G space, which is an
  identity when every pair is resolved on its assigned level),
- the GGA potential is validated as the exact functional derivative of
  the multigrid energy (finite differences along a random symmetric dm
  direction) — this pins the collocation normalization AND the
  divergence form of the vsigma term,
- the GGA SCF energy agrees with single-mesh FFTDF to the spectral-vs-
  collocated density-gradient resolution (~1e-3 Ha at this mesh; both
  converge to the same limit with the mesh).
"""
import numpy as np
import pytest

from pyscf_tpu.pbc.gto import Cell

DIAMOND = dict(
    atom='C 0 0 0; C 0.8917 0.8917 0.8917',
    a=[[0, 1.7834, 1.7834], [1.7834, 0, 1.7834], [1.7834, 1.7834, 0]],
    basis='gth-szv', pseudo='gth-pade', verbose=0)


def _scf(mf):
    mf.conv_tol = 1e-8
    mf.init_guess = 'hcore'
    mf.verbose = 0
    e = mf.kernel()
    assert mf.converged
    return e


def test_multigrid_j_matches_fftdf():
    from pyscf_tpu.pbc.df.fft import FFTDF
    from pyscf_tpu.pbc.dft.multigrid import MultiGridFFTDF
    cell = Cell(mesh=[11] * 3, **DIAMOND).build()
    rng = np.random.RandomState(1)
    dm = rng.rand(cell.nao, cell.nao) * 0.1 + np.eye(cell.nao)
    dm = dm + dm.T
    vj_ref, _ = FFTDF(cell).get_jk(dm, with_k=False)
    mg = MultiGridFFTDF(cell)
    vj_mg, ej = mg.get_j_multigrid(dm)
    assert np.abs(np.asarray(vj_mg) - np.asarray(vj_ref)).max() < 1e-9
    assert abs(ej - 0.5 * float(np.sum(np.asarray(vj_ref) * dm))) < 1e-9


def test_multigrid_gga_veff_is_functional_derivative():
    """vhf == d(Ej+Exc)/d(dm): pins collocation normalization + the GGA
    divergence term by finite differences."""
    from pyscf_tpu.pbc.dft.multigrid import MultiGridFFTDF
    cell = Cell(mesh=[11] * 3, **DIAMOND).build()
    mg = MultiGridFFTDF(cell)
    rng = np.random.RandomState(2)
    dm = np.eye(cell.nao) + 0.05 * rng.rand(cell.nao, cell.nao)
    dm = dm + dm.T
    pert = rng.rand(cell.nao, cell.nao)
    pert = pert + pert.T

    def e2(d):
        _, ej, exc = mg.get_veff_rks(d, 'pbe,pbe')
        return ej + exc

    vhf, ej, exc = mg.get_veff_rks(dm, 'pbe,pbe')
    h = 1e-5
    de_fd = (e2(dm + h * pert) - e2(dm - h * pert)) / (2 * h)
    de_an = float(np.sum(np.asarray(vhf) * pert))
    assert abs(de_fd - de_an) < 1e-7 * max(1.0, abs(de_fd))


@pytest.mark.slow
def test_multigrid_lda_scf_matches_fftdf():
    from pyscf_tpu.pbc.dft import RKS
    cell = Cell(mesh=[15] * 3, **DIAMOND).build()
    e_ref = _scf(RKS(cell, xc='lda,vwn'))
    e_mg = _scf(RKS(cell, xc='lda,vwn').multigrid_fftdf_())
    assert abs(e_mg - e_ref) < 1e-10


@pytest.mark.slow
def test_multigrid_pbe_scf_near_fftdf():
    from pyscf_tpu.pbc.dft import RKS
    cell = Cell(mesh=[15] * 3, **DIAMOND).build()
    e_ref = _scf(RKS(cell, xc='pbe,pbe'))
    e_mg = _scf(RKS(cell, xc='pbe,pbe').multigrid_fftdf_())
    # spectral (multigrid) vs collocated (FFTDF numint) density gradient:
    # both are mesh-converging discretizations of the same functional
    assert abs(e_mg - e_ref) < 1e-3
