"""FCI for singlet states with na == nb (reference analog:
pyscf/fci/direct_spin0.py).

The reference halves the contraction work using ci = ci.T symmetry inside
its C kernels; on TPU the sigma build is already one dense matmul, so the
symmetry is imposed as a projector P(c) = (c + c.T)/2 around the spin1
matvec — same eigenstates, guaranteed-symmetric CI vectors, no extra
kernels to maintain.
"""
import numpy as np

from ..lib.linalg import davidson
from . import cistring
from . import direct_spin1
from .direct_spin1 import (_unpack_nelec, absorb_h1e, make_hdiag,  # noqa: F401
                           make_rdm1, make_rdm12)


def contract_2e(h2e, fcivec, norb, nelec):
    na_e, nb_e = _unpack_nelec(nelec)
    assert na_e == nb_e, 'direct_spin0 requires na == nb'
    na = cistring.num_strings(norb, na_e)
    c = 0.5 * (np.asarray(fcivec).reshape(na, na)
               + np.asarray(fcivec).reshape(na, na).T)
    hc = np.asarray(direct_spin1.contract_2e(h2e, c, norb, nelec))
    return 0.5 * (hc + hc.T)


def kernel(h1e, eri, norb, nelec, ecore=0.0, nroots=1, ci0=None,
           max_cycle=100, tol=1e-10):
    na_e, nb_e = _unpack_nelec(nelec)
    assert na_e == nb_e, 'direct_spin0 requires na == nb'
    na = cistring.num_strings(norb, na_e)
    h2e = absorb_h1e(h1e, eri, norb, nelec, 0.5)

    def matvec(x):
        return contract_2e(h2e, x, norb, nelec).ravel()

    hdiag = make_hdiag(h1e, eri, norb, nelec)
    if ci0 is None:
        nseed = min(nroots, na * na)
        order = np.argsort(np.asarray(hdiag))
        x0 = np.zeros((nseed, na * na))
        for i in range(nseed):
            # symmetric seed
            A, B = divmod(int(order[i]), na)
            x0[i] = 0.0
            m = x0[i].reshape(na, na)
            m[A, B] = m[B, A] = 1.0
            x0[i] /= np.linalg.norm(x0[i])
    else:
        x0 = np.asarray(ci0).ravel()
    e, vecs, conv = davidson(matvec, x0, neig=nroots, max_cycle=max_cycle,
                             tol=tol, hdiag=hdiag)
    if nroots == 1:
        return float(e[0]) + ecore, vecs[0].reshape(na, na)
    return np.asarray(e) + ecore, [v.reshape(na, na) for v in vecs]
