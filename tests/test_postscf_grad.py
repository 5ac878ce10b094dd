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


def test_tda_omega_functional_consistency():
    """The stationary Rayleigh functionals used by the TDA/TDHF gradient
    reproduce the solver's excitation energies exactly (all variants)."""
    import jax.numpy as jnp
    from pyscf_tpu.tdscf.rhf import TDA, TDHF
    from pyscf_tpu.grad.tdrhf import _omega_functional
    mol = pt.M(atom='O 0 0 0; H 0 -1.43 1.11; H 0 1.43 1.11',
               unit='bohr', basis='sto-3g', verbose=0)
    X0 = jnp.asarray(np.asarray(mol.coords))

    def parts(mf):
        occ = np.asarray(mf.mo_occ) > 0
        C = jnp.asarray(mf.mo_coeff)
        return (C[:, occ], C[:, ~occ],
                jnp.asarray(np.asarray(mf.mo_energy)[occ]),
                jnp.asarray(np.asarray(mf.mo_energy)[~occ]))

    mfk = pt.dft.RKS(mol, xc='pbe,pbe').density_fit()
    mfk.conv_tol = 1e-12
    mfk.kernel()
    for singlet in (True, False):
        td = TDA(mfk)
        td.singlet = singlet
        td.nstates = 2
        es = td.kernel()
        f = _omega_functional(mfk, singlet)
        x = jnp.asarray(np.asarray(td.xy[0][0]))
        w = float(f(X0, *parts(mfk), x))
        assert abs(w - float(es[0])) < 1e-12
    mf = mol.RHF().density_fit()
    mf.conv_tol = 1e-12
    mf.kernel()
    td = TDHF(mf)
    td.nstates = 2
    es = td.kernel()
    x, y = td.xy[0]
    f = _omega_functional(mf, True, rpa=True)
    w = float(f(X0, *parts(mf), jnp.asarray(np.asarray(x)),
                jnp.asarray(np.asarray(y))))
    assert abs(w - float(es[0])) < 1e-12


@pytest.mark.slow
def test_tda_rhf_gradient_fd():
    """Analytic TDA excited-state gradient vs finite differences."""
    from pyscf_tpu.tdscf.rhf import TDA

    def efn(coords):
        mol = pt.M(atom=[('O', tuple(coords[0])), ('H', tuple(coords[1])),
                         ('H', tuple(coords[2]))],
                   unit='bohr', basis='sto-3g', verbose=0)
        mf = mol.RHF().density_fit()
        mf.conv_tol = 1e-13
        mf.kernel()
        td = TDA(mf)
        td.nstates = 2
        es = td.kernel()
        return float(mf.e_tot + es[0]), td

    c0 = np.array([[0., 0., 0.], [0., -1.43, 1.11], [0., 1.43, 1.11]])
    e, td = efn(c0)
    de = td.nuc_grad_method(state=1).kernel()
    h = 1e-4
    for (A, x) in ((1, 1), (0, 2)):
        cp = c0.copy()
        cp[A, x] += h
        cm = c0.copy()
        cm[A, x] -= h
        fd = (efn(cp)[0] - efn(cm)[0]) / (2 * h)
        assert abs(fd - de[A, x]) < 1e-5


def test_mp2_grad_scanner_smoke():
    """as_scanner() rebuilds the Mole correctly (regression: it used a
    non-existent mol attribute) and returns (e_tot, grad) at a displaced
    geometry."""
    mol = pt.M(atom='H 0 0 0; H 0 0 0.74', basis='sto-3g', verbose=0)
    mf = _dfmf(mol)
    from pyscf_tpu.mp import MP2
    mp = MP2(mf)
    mp.kernel()
    scan = mp.Gradients().as_scanner()
    coords = np.asarray(mol.coords).copy()
    coords[1, 2] += 0.05
    e, g = scan(coords)
    assert scan.converged
    assert np.isfinite(e) and e < -1.0
    assert g.shape == (2, 3)
    assert abs(g.sum(axis=0)).max() < 1e-9
