"""Gradient tests: analytic vs finite differences (the reference's own
cross-validation strategy, grad/test/test_rhf.py:148)."""
import numpy as np
import pytest

import pyscf_tpu as pt

ATOM = 'O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587'


@pytest.mark.slow
def test_rhf_grad_vs_fd():
    mol = pt.M(atom=ATOM, basis='sto-3g', verbose=0)
    mf = mol.RHF()
    mf.verbose = 0
    mf.conv_tol = 1e-12
    mf.kernel()
    from pyscf_tpu.grad.rhf import Gradients, finite_difference_gradient
    g = np.asarray(Gradients(mf).kernel())

    def efac(m):
        f = m.RHF()
        f.verbose = 0
        f.conv_tol = 1e-12
        return f.kernel()

    gfd = finite_difference_gradient(efac, mol, 1e-4)
    assert abs(g - gfd).max() < 1e-6
    # translational invariance
    assert abs(g.sum(axis=0)).max() < 1e-9


def test_grad_nuc():
    mol = pt.M(atom='H 0 0 0; H 0 0 0.74', basis='sto-3g', verbose=0)
    from pyscf_tpu.grad.rhf import grad_nuc
    g = grad_nuc(mol)
    r = 0.74 / 0.52917721092
    assert abs(g[0, 2] - 1.0 / r ** 2) < 1e-10
    assert abs(g.sum(axis=0)).max() < 1e-12


def test_df_rhf_autodiff_grad():
    """DF-RHF analytic (autodiff) gradient vs finite differences."""
    mol = pt.M(atom=ATOM, basis='sto-3g', verbose=0)
    mf = mol.RHF().density_fit()
    mf.conv_tol = 1e-12
    mf.kernel()
    g = np.asarray(mf.Gradients().kernel())
    assert abs(g.sum(axis=0)).max() < 1e-8   # translational invariance
    h = 1e-4
    x0 = np.asarray(mol.coords).copy()

    def efun(coords):
        m2 = mol.copy()
        m2.set_geom_(coords)
        f = m2.RHF().density_fit()
        f.conv_tol = 1e-12
        return f.kernel()

    for (a, d) in [(0, 2), (1, 1)]:
        xp = x0.copy(); xp[a, d] += h
        xm = x0.copy(); xm[a, d] -= h
        gfd = (efun(xp) - efun(xm)) / (2 * h)
        assert abs(g[a, d] - gfd) < 1e-6


@pytest.mark.slow
def test_df_rks_autodiff_grad():
    """DF-RKS (B3LYP) autodiff gradient vs finite differences (no grid
    response on either side of the comparison beyond the FD truth)."""
    mol = pt.M(atom=ATOM, basis='sto-3g', verbose=0)
    mf = pt.dft.RKS(mol, xc='b3lypg').density_fit()
    mf.conv_tol = 1e-12
    mf.kernel()
    g = np.asarray(mf.Gradients().kernel())
    h = 2e-4
    x0 = np.asarray(mol.coords).copy()

    def efun(coords):
        m2 = mol.copy()
        m2.set_geom_(coords)
        f = pt.dft.RKS(m2, xc='b3lypg').density_fit()
        f.conv_tol = 1e-12
        return f.kernel()

    xp = x0.copy(); xp[1, 1] += h
    xm = x0.copy(); xm[1, 1] -= h
    gfd = (efun(xp) - efun(xm)) / (2 * h)
    assert abs(g[1, 1] - gfd) < 1e-5


@pytest.mark.slow
def test_df_uhf_autodiff_grad():
    molu = pt.M(atom=ATOM, basis='sto-3g', charge=1, spin=1, verbose=0)
    mf = pt.scf.UHF(molu).density_fit()
    mf.conv_tol = 1e-12
    mf.kernel()
    g = np.asarray(mf.Gradients().kernel())
    h = 1e-4
    x0 = np.asarray(molu.coords).copy()

    def efun(coords):
        m2 = molu.copy()
        m2.set_geom_(coords)
        f = pt.scf.UHF(m2).density_fit()
        f.conv_tol = 1e-12
        return f.kernel()

    xp = x0.copy(); xp[0, 2] += h
    xm = x0.copy(); xm[0, 2] -= h
    gfd = (efun(xp) - efun(xm)) / (2 * h)
    assert abs(g[0, 2] - gfd) < 1e-6


def test_internal_coordinate_optimizer():
    """Redundant-internal BFGS reaches the RHF/STO-3G water optimum
    (R=0.989 A, 100.0 deg) and matches the Cartesian optimizer energy."""
    import pyscf_tpu as pt
    from pyscf_tpu.geomopt.internal import detect_internals
    from pyscf_tpu.geomopt.internal import optimize as opt_int
    from pyscf_tpu.lib.parameters import BOHR
    mol = pt.M(atom='O 0 0 0; H 0 -0.9 0.4; H 0 0.9 0.4', basis='sto-3g')
    bonds, angles, dihedrals = detect_internals(mol)
    assert len(bonds) == 2 and len(angles) == 1

    def mf_factory(m):
        mf = m.RHF()
        mf.conv_tol = 1e-11
        mf.init_guess = 'hcore'
        mf.kernel()
        return mf

    mol_i, e_i = opt_int(mf_factory, mol)
    r = np.asarray(mol_i.coords)
    roh = np.linalg.norm(r[0] - r[1]) * BOHR
    ang = np.degrees(np.arccos(
        np.dot(r[1] - r[0], r[2] - r[0])
        / np.linalg.norm(r[1] - r[0]) / np.linalg.norm(r[2] - r[0])))
    assert abs(roh - 0.989) < 0.01
    assert abs(ang - 100.0) < 2.0
    assert len(e_i) <= 10
