"""FCI addons: spin-penalized solve and CI-vector utilities.

Reference analog: pyscf/fci/addons.py (fix_spin_:?, transform helpers).
The spin constraint is a penalty Hamiltonian H' = H + shift*(S^2 - ss)
applied inside the Davidson matvec; states with <S^2> above the target
are pushed up by ~shift, leaving the target-spin spectrum untouched.
"""
import numpy as np

from ..lib.linalg import davidson
from . import cistring
from . import direct_spin1
from .direct_spin1 import _unpack_nelec
from .spin_op import contract_ss


def kernel_fixed_spin(h1e, eri, norb, nelec, ss=None, shift=0.2, ecore=0.0,
                      nroots=1, ci0=None, max_cycle=100, tol=1e-10):
    """FCI ground state constrained to <S^2> = ss (default: sz(sz+1))."""
    na_e, nb_e = _unpack_nelec(nelec)
    if ss is None:
        sz = 0.5 * abs(na_e - nb_e)
        ss = sz * (sz + 1.0)
    na = cistring.num_strings(norb, na_e)
    nb = cistring.num_strings(norb, nb_e)
    h2e = direct_spin1.absorb_h1e(h1e, eri, norb, nelec, 0.5)

    def matvec(x):
        hx = np.asarray(direct_spin1.contract_2e(
            h2e, x.reshape(na, nb), norb, nelec)).ravel()
        ssx = contract_ss(x.reshape(na, nb), norb, (na_e, nb_e)).ravel()
        return hx + shift * (ssx - ss * x)

    hdiag = direct_spin1.make_hdiag(h1e, eri, norb, nelec)
    if ci0 is None:
        nseed = min(max(nroots, 2), na * nb)
        order = np.argsort(np.asarray(hdiag))
        x0 = np.zeros((nseed, na * nb))
        for i in range(nseed):
            x0[i, order[i]] = 1.0
    else:
        x0 = np.asarray(ci0).ravel()
    e, vecs, conv = davidson(matvec, x0, neig=nroots, max_cycle=max_cycle,
                             tol=tol, hdiag=hdiag)
    if nroots == 1:
        return float(e[0]) + ecore, vecs[0].reshape(na, nb)
    return np.asarray(e) + ecore, [v.reshape(na, nb) for v in vecs]


def fix_spin_(fcisolver, shift=0.2, ss=None):
    """Decorate an FCI solver object so .kernel solves the spin-penalized
    problem (reference fci/addons.py fix_spin_)."""
    def kernel(h1e, eri, norb, nelec, **kwargs):
        kwargs.pop('ss', None)
        return kernel_fixed_spin(h1e, eri, norb, nelec, ss=ss, shift=shift,
                                 **kwargs)
    fcisolver.kernel = kernel
    fcisolver.fix_spin = (shift, ss)
    return fcisolver


def overlap(bra, ket, norb=None, nelec=None):
    return float(np.dot(np.asarray(bra).ravel(), np.asarray(ket).ravel()))


def initguess_triplet(norb, nelec, breaksym='0b11'):
    """An Sz=0 seed vector orthogonal to the closed-shell determinant,
    useful to converge triplet roots in the ms=0 sector."""
    na_e, nb_e = _unpack_nelec(nelec)
    na = cistring.num_strings(norb, na_e)
    nb = cistring.num_strings(norb, nb_e)
    ci0 = np.zeros((na, nb))
    ci0[0, 1] = 1.0 / np.sqrt(2.0)
    ci0[1, 0] = -1.0 / np.sqrt(2.0)
    return ci0
