"""Analytic CPHF Hessian vs FD-of-analytic-gradient (the reference's own
cross-validation pattern, hessian/test/test_rhf.py)."""
import numpy as np
import pytest

import pyscf_tpu as pt

ATOM = 'O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587'


def _fd_hessian(mf0, step=1e-3):
    from pyscf_tpu.hessian import HessianFD
    return HessianFD(mf0, step=step).kernel()


def test_df_rhf_analytic_hessian():
    mol = pt.M(atom='H 0 0 0; H 0 0 0.74', basis='sto-3g', verbose=0)
    mf = mol.RHF().density_fit()
    mf.conv_tol = 1e-12
    mf.kernel()
    h = mf.Hessian().kernel()
    natm = mol.natm
    assert h.shape == (natm, 3, natm, 3)
    # translational invariance: rows sum to zero over atoms
    assert abs(h.sum(axis=0)).max() < 1e-7
    # symmetric under (atom,xyz) pair exchange
    hm = h.transpose(0, 1, 2, 3).reshape(3 * natm, 3 * natm)
    assert abs(hm - hm.T).max() < 1e-9


@pytest.mark.slow
def test_df_rhf_analytic_hessian_vs_fd():
    mol = pt.M(atom=ATOM, basis='sto-3g', verbose=0)
    mf = mol.RHF().density_fit()
    mf.conv_tol = 1e-12
    mf.kernel()
    h = mf.Hessian().kernel()
    hfd = _fd_hessian(mf)
    assert abs(h - hfd).max() < 1e-5


@pytest.mark.slow
def test_df_rks_analytic_hessian_vs_fd():
    mol = pt.M(atom=ATOM, basis='sto-3g', verbose=0)
    mf = pt.dft.RKS(mol, xc='b3lypg').density_fit()
    mf.conv_tol = 1e-12
    mf.grids.level = 5          # dense grid: no-grid-response error small
    mf.kernel()
    h = mf.Hessian().kernel()
    hfd = _fd_hessian(mf)
    assert abs(h - hfd).max() < 2e-4


@pytest.mark.slow
def test_harmonic_frequencies_h2():
    """H2/STO-3G harmonic frequency from the analytic Hessian: the stretch
    mode is the only large eigenvalue; golden value from the same-level
    FD Hessian (internally consistent, reference thermo pattern)."""
    mol = pt.M(atom='H 0 0 0; H 0 0 0.74', basis='sto-3g', verbose=0)
    mf = mol.RHF().density_fit()
    mf.conv_tol = 1e-12
    mf.kernel()
    from pyscf_tpu.hessian import harmonic_analysis
    h = mf.Hessian().kernel()
    res = harmonic_analysis(mol, h)
    freqs = np.sort(res['freq_wavenumber'])
    hfd = _fd_hessian(mf)
    ref = np.sort(harmonic_analysis(mol, hfd)['freq_wavenumber'])
    assert abs(freqs[-1] - ref[-1]) < 5.0   # cm^-1


def test_df_uhf_analytic_hessian():
    """Spin-coupled CPHF Hessian for an open-shell doublet (OH radical):
    shape, translational invariance, symmetry."""
    mol = pt.M(atom='O 0 0 0; H 0 0 0.97', basis='sto-3g', spin=1,
               verbose=0)
    mf = mol.UHF().density_fit()
    mf.conv_tol = 1e-12
    mf.kernel()
    h = mf.Hessian().kernel()
    natm = mol.natm
    assert h.shape == (natm, 3, natm, 3)
    assert abs(h.sum(axis=0)).max() < 1e-6
    hm = h.reshape(3 * natm, 3 * natm)
    assert abs(hm - hm.T).max() < 1e-9


@pytest.mark.slow
def test_df_uhf_analytic_hessian_vs_fd():
    mol = pt.M(atom='O 0 0 0; H 0 0 0.97', basis='sto-3g', spin=1,
               verbose=0)
    mf = mol.UHF().density_fit()
    mf.conv_tol = 1e-12
    mf.kernel()
    h = mf.Hessian().kernel()
    hfd = _fd_hessian(mf)
    assert abs(h - hfd).max() < 1e-5


@pytest.mark.slow
def test_df_uks_analytic_hessian_vs_fd():
    mol = pt.M(atom='O 0 0 0; H 0 0 0.97', basis='sto-3g', spin=1,
               verbose=0)
    mf = pt.dft.UKS(mol, xc='pbe0').density_fit()
    mf.conv_tol = 1e-12
    mf.grids.level = 5
    mf.kernel()
    h = mf.Hessian().kernel()
    hfd = _fd_hessian(mf)
    assert abs(h - hfd).max() < 2e-4
