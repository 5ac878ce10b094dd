"""Analytic DF-CASSCF nuclear gradients (grad/casscf.py) vs finite
differences — the reference's own cross-validation strategy
(reference grad/test/test_casscf.py)."""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.mcscf import CASSCF
from pyscf_tpu.grad.casscf import Gradients


def _casscf(mol, ncas, nelecas):
    mf = mol.RHF().density_fit()
    mf.conv_tol = 1e-12
    mf.kernel()
    mc = CASSCF(mf, ncas, nelecas).density_fit()
    mc.conv_tol = 1e-11
    mc.kernel()
    return mc


def test_casscf_grad_lih():
    """LiH CASSCF(2,2): translational invariance of the analytic grad."""
    mol = pt.M(atom='Li 0 0 0; H 0 0 1.6', basis='sto-3g', verbose=0)
    mc = _casscf(mol, 2, 2)
    assert mc.converged
    g = Gradients(mc).kernel()
    assert abs(g.sum(axis=0)).max() < 1e-10
    # bond force is along z only
    assert abs(g[:, :2]).max() < 1e-9


@pytest.mark.slow
def test_casscf_grad_vs_fd_lih():
    mol = pt.M(atom='Li 0 0 0; H 0 0 1.6', basis='sto-3g', verbose=0)
    mc = _casscf(mol, 2, 2)
    g = Gradients(mc).kernel()
    h = 1e-4
    x0 = np.asarray(mol.coords).copy()

    def etot(coords):
        m2 = mol.copy()
        m2.set_geom_(coords)
        return _casscf(m2, 2, 2).e_tot

    xp = x0.copy(); xp[1, 2] += h
    xm = x0.copy(); xm[1, 2] -= h
    gfd = (etot(xp) - etot(xm)) / (2 * h)
    assert abs(g[1, 2] - gfd) < 5e-6


@pytest.mark.slow
def test_casscf_grad_vs_fd_h2o():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g', verbose=0)
    mc = _casscf(mol, 4, 4)
    g = Gradients(mc).kernel()
    assert abs(g.sum(axis=0)).max() < 1e-9
    h = 1e-4
    x0 = np.asarray(mol.coords).copy()

    def etot(coords):
        m2 = mol.copy()
        m2.set_geom_(coords)
        return _casscf(m2, 4, 4).e_tot

    xp = x0.copy(); xp[2, 1] += h
    xm = x0.copy(); xm[2, 1] -= h
    gfd = (etot(xp) - etot(xm)) / (2 * h)
    assert abs(g[2, 1] - gfd) < 5e-6
