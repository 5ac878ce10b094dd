"""Post-HF analytic gradients (MP2, CCSD) vs finite differences —
the reference's own cross-validation strategy (grad/test/test_mp2.py,
grad/test/test_ccsd.py)."""
import numpy as np
import pytest

import pyscf_tpu as pt

ATOM = 'O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587'


def _dfmf(mol):
    mf = mol.RHF().density_fit()
    mf.conv_tol = 1e-12
    mf.kernel()
    return mf


def test_mp2_grad_h2():
    """Analytic DF-MP2 gradient on H2: translational invariance + FD."""
    mol = pt.M(atom='H 0 0 0; H 0 0 0.74', basis='sto-3g', verbose=0)
    mf = _dfmf(mol)
    from pyscf_tpu.mp import MP2
    mp = MP2(mf)
    mp.kernel()
    g = np.asarray(mp.Gradients().kernel())
    assert abs(g.sum(axis=0)).max() < 1e-10
    h = 1e-4
    x0 = np.asarray(mol.coords).copy()

    def etot(coords):
        m2 = mol.copy()
        m2.set_geom_(coords)
        f = _dfmf(m2)
        return f.e_tot + float(MP2(f).kernel()[0])

    xp = x0.copy(); xp[1, 2] += h
    xm = x0.copy(); xm[1, 2] -= h
    gfd = (etot(xp) - etot(xm)) / (2 * h)
    assert abs(g[1, 2] - gfd) < 5e-6


@pytest.mark.slow
def test_mp2_grad_vs_fd_h2o():
    mol = pt.M(atom=ATOM, basis='sto-3g', verbose=0)
    mf = _dfmf(mol)
    from pyscf_tpu.mp import MP2
    mp = MP2(mf)
    mp.kernel()
    g = np.asarray(mp.Gradients().kernel())
    assert abs(g.sum(axis=0)).max() < 1e-10
    h = 1e-4
    x0 = np.asarray(mol.coords).copy()

    def etot(coords):
        m2 = mol.copy()
        m2.set_geom_(coords)
        f = _dfmf(m2)
        return f.e_tot + float(MP2(f).kernel()[0])

    for (a, d) in [(0, 2), (1, 1)]:
        xp = x0.copy(); xp[a, d] += h
        xm = x0.copy(); xm[a, d] -= h
        gfd = (etot(xp) - etot(xm)) / (2 * h)
        assert abs(g[a, d] - gfd) < 5e-6


@pytest.mark.slow
def test_ccsd_grad_vs_fd_h2o():
    """CCSD Lagrangian gradient vs FD of the DF-consistent CCSD energy."""
    mol = pt.M(atom=ATOM, basis='sto-3g', verbose=0)
    mf = _dfmf(mol)
    from pyscf_tpu.cc import CCSD
    mycc = CCSD(mf)
    g = np.asarray(mycc.Gradients().kernel())
    assert abs(g.sum(axis=0)).max() < 1e-10
    h = 1e-4
    x0 = np.asarray(mol.coords).copy()

    def etot(coords):
        m2 = mol.copy()
        m2.set_geom_(coords)
        f = _dfmf(m2)
        B = np.asarray(f.with_df.cderi)
        f._eri = np.einsum('pij,pkl->ijkl', B, B)
        from pyscf_tpu.cc.gccsd import GCCSD
        cc = GCCSD(f)
        cc.verbose = 0
        ec, _, _ = cc.kernel()
        assert cc.converged
        return f.e_tot + float(ec)

    for (a, d) in [(0, 2), (1, 1)]:
        xp = x0.copy(); xp[a, d] += h
        xm = x0.copy(); xm[a, d] -= h
        gfd = (etot(xp) - etot(xm)) / (2 * h)
        assert abs(g[a, d] - gfd) < 5e-6
