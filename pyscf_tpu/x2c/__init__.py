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
