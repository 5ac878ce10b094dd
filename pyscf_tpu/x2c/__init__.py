"""Exact two-component relativity, spin-free X2C-1e (analog of reference
pyscf/x2c/sfx2c1e.py + x2c/x2c.py:804 _get_hcore_fw / :872 _x2c1e_get_hcore).
"""
import numpy as np
import scipy.linalg
import jax.numpy as jnp

from ..lib.parameters import LIGHT_SPEED


def x2c1e_hcore(mol, c=LIGHT_SPEED):
    """Spin-free X2C-1e core Hamiltonian in the contracted AO basis."""
    from ..ops.integrals.int1e_deriv import int1e_pnucp
    t = np.asarray(mol.intor('int1e_kin'))
    v = np.asarray(mol.intor('int1e_nuc'))
    s = np.asarray(mol.intor('int1e_ovlp'))
    w = np.asarray(int1e_pnucp(mol))
    nao = s.shape[0]
    n2 = 2 * nao
    h = np.zeros((n2, n2))
    m = np.zeros((n2, n2))
    h[:nao, :nao] = v
    h[:nao, nao:] = t
    h[nao:, :nao] = t
    h[nao:, nao:] = w * (0.25 / c ** 2) - t
    m[:nao, :nao] = s
    m[nao:, nao:] = t * (0.5 / c ** 2)
    e, a = scipy.linalg.eigh(h, m)
    cl = a[:nao, nao:]
    e = e[nao:]
    # FW picture change via the A-basis form (reference x2c.py Eq (2)):
    # R[A]^{-1} A^+ S, h1 = r^+ e r
    wv, u = np.linalg.eigh(cl.T @ s @ cl)
    idx = wv > 1e-14
    r = (u[:, idx] / np.sqrt(wv[idx])) @ u[:, idx].T @ cl.T @ s
    h1 = (r.T * e) @ r
    return jnp.asarray(h1)


def sfx2c1e(mf):
    """Decorate a mean-field object with the spin-free X2C-1e Hamiltonian
    (reference scf-level decorator mf.x2c() / sfx2c1e.py)."""
    mol = mf.mol
    h1 = x2c1e_hcore(mol)

    def get_hcore(mol_=None):
        return h1

    mf.get_hcore = get_hcore
    return mf


x2c = sfx2c1e


def x2c1e_spinor_hcore(mol, c=LIGHT_SPEED):
    """Two-component (spinor) X2C-1e core Hamiltonian with spin-orbit
    coupling, (2 nao, 2 nao) complex Hermitian in the GHF spinor layout
    (alpha block first). Reference analog: pyscf/x2c/x2c.py
    _x2c1e_get_hcore with spinor integrals; here the small-small block is

      W = sigma.p V sigma.p = pVp I + i sigma.(p V x p)

    from the McMurchie-Davidson ipnucip kernels. Exact for one-electron
    systems (validated against analytic Dirac eigenvalues in
    tests/test_x2c_spinor.py).
    """
    from ..ops.integrals.int1e_deriv import int1e_pnucp, int1e_pnucxp
    t = np.asarray(mol.intor('int1e_kin'))
    v = np.asarray(mol.intor('int1e_nuc'))
    s = np.asarray(mol.intor('int1e_ovlp'))
    pvp = np.asarray(int1e_pnucp(mol))
    wso = np.asarray(int1e_pnucxp(mol))       # (3, nao, nao), antisym
    nao = s.shape[0]
    n2 = 2 * nao

    def spin2(m):
        out = np.zeros((n2, n2), dtype=complex)
        out[:nao, :nao] = m
        out[nao:, nao:] = m
        return out

    w2 = spin2(pvp)
    w2[:nao, :nao] += 1j * wso[2]
    w2[nao:, nao:] -= 1j * wso[2]
    w2[:nao, nao:] += 1j * wso[0] + wso[1]
    w2[nao:, :nao] += 1j * wso[0] - wso[1]

    v2, t2, s2 = spin2(v), spin2(t), spin2(s)
    n4 = 2 * n2
    h = np.zeros((n4, n4), dtype=complex)
    m = np.zeros((n4, n4), dtype=complex)
    h[:n2, :n2] = v2
    h[:n2, n2:] = t2
    h[n2:, :n2] = t2
    h[n2:, n2:] = w2 * (0.25 / c ** 2) - t2
    m[:n2, :n2] = s2
    m[n2:, n2:] = t2 * (0.5 / c ** 2)
    e, a = scipy.linalg.eigh(h, m)
    cl = a[:n2, n2:]
    e = e[n2:]
    wv, u = np.linalg.eigh(cl.conj().T @ s2 @ cl)
    idx = wv > 1e-14
    r = (u[:, idx] / np.sqrt(wv[idx])) @ u[:, idx].conj().T \
        @ cl.conj().T @ s2
    h1 = (r.conj().T * e) @ r
    return jnp.asarray(0.5 * (h1 + h1.conj().T))


def x2c_spinor(mf):
    """Decorate a GHF-like object with the spinor X2C-1e Hamiltonian
    (reference x2c/x2c.py X2C-HF)."""
    h1 = x2c1e_spinor_hcore(mf.mol)

    def get_hcore(mol_=None):
        return h1

    mf.get_hcore = get_hcore
    return mf
