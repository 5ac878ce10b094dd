"""Full CI sigma contraction and solver (analog of reference
pyscf/fci/direct_spin1.py: contract_2e:87, make_hdiag:159, kernel_ms1:607;
C kernels lib/mcscf/fci_contract.c).

The alpha/beta-string link tables (irregular C loops in the reference)
become flat gather/scatter index arrays; the (pq|rs) contraction in the
middle is one dense matmul on the MXU. Davidson runs host-side with
device matvecs.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..lib.linalg import davidson
from . import cistring


def absorb_h1e(h1e, eri, norb, nelec, fac=1.0):
    """Fold one-electron terms into the two-electron tensor."""
    h1e = np.asarray(h1e)
    h2e = np.array(eri, dtype=np.float64, copy=True).reshape(
        norb, norb, norb, norb)
    f1e = h1e - np.einsum('jiik->jk', h2e) * 0.5
    f1e = f1e / (sum(_unpack_nelec(nelec)) + 1e-100)
    for k in range(norb):
        h2e[k, k, :, :] += f1e
        h2e[:, :, k, k] += f1e
    return h2e * fac


def _unpack_nelec(nelec):
    if isinstance(nelec, (int, np.integer)):
        nb = nelec // 2
        return nelec - nb, nb
    return tuple(nelec)


def _flat_links(norb, nelec, nstr):
    """Flattened link arrays: (I_rep, pq_flat, J, sign) each (nstr*nlink,)."""
    tab = cistring.gen_linkstr_index(norb, nelec)
    nlink = tab.shape[1]
    I = np.repeat(np.arange(nstr, dtype=np.int32), nlink)
    p = tab[:, :, 0].ravel()
    q = tab[:, :, 1].ravel()
    J = tab[:, :, 2].ravel()
    sign = tab[:, :, 3].ravel().astype(np.float64)
    pq = p.astype(np.int32) * norb + q.astype(np.int32)
    return I, pq, J, sign


@partial(jax.jit, static_argnums=(3, 4, 5))
def _contract_2e(h2e_mat, ci0, links, norb, na, nb):
    """sigma = H2e . ci0 using flattened link tables.

    h2e_mat: (norb^2, norb^2); ci0: (na, nb);
    links = (Ia, pqa, Ja, sa, Ib, pqb, Jb, sb).
    """
    Ia, pqa, Ja, sa, Ib, pqb, Jb, sb = links
    n2 = norb * norb
    # t1[pq, J, :] += sign * c[I, :]  (alpha);  t1[pq, :, J] += sign*c[:, I]
    t1 = jnp.zeros((n2, na, nb))
    upd_a = sa[:, None] * ci0[Ia, :]
    t1 = t1.at[pqa, Ja, :].add(upd_a)
    upd_b = sb[:, None] * ci0[:, Ib].T
    t1 = t1.at[pqb, :, Jb].add(upd_b)
    # g[pq, A, B] = sum_rs h2e[pq, rs] t1[rs, A, B]
    g = (h2e_mat @ t1.reshape(n2, na * nb)).reshape(n2, na, nb)
    # scatter back
    out = jnp.zeros((na, nb))
    out = out.at[Ja, :].add(sa[:, None] * g[pqa, Ia, :])
    upd = sb[:, None] * g[pqb, :, Ib]      # (nlinks, na)
    out = out.at[:, Jb].add(upd.T)
    return out


def contract_2e(h2e, fcivec, norb, nelec):
    na_e, nb_e = _unpack_nelec(nelec)
    na = cistring.num_strings(norb, na_e)
    nb = cistring.num_strings(norb, nb_e)
    Ia, pqa, Ja, sa = _flat_links(norb, na_e, na)
    Ib, pqb, Jb, sb = _flat_links(norb, nb_e, nb)
    links = tuple(jnp.asarray(x) for x in (Ia, pqa, Ja, sa, Ib, pqb, Jb, sb))
    h2e_mat = jnp.asarray(np.asarray(h2e).reshape(norb * norb, norb * norb))
    ci0 = jnp.asarray(fcivec).reshape(na, nb)
    return _contract_2e(h2e_mat, ci0, links, norb, na, nb)


def make_hdiag(h1e, eri, norb, nelec):
    na_e, nb_e = _unpack_nelec(nelec)
    h1e = np.asarray(h1e)
    eri4 = np.asarray(eri).reshape(norb, norb, norb, norb)
    jdiag = np.einsum('iijj->ij', eri4)
    kdiag = np.einsum('ijji->ij', eri4)
    stra = cistring.make_strings(norb, na_e)
    strb = cistring.make_strings(norb, nb_e)
    occa = np.array([[(s >> o) & 1 for o in range(norb)] for s in stra],
                    dtype=np.float64)
    occb = np.array([[(s >> o) & 1 for o in range(norb)] for s in strb],
                    dtype=np.float64)
    hd = np.diag(h1e)
    e1a = occa @ hd
    e1b = occb @ hd
    jaa = 0.5 * np.einsum('xi,ij,xj->x', occa, jdiag, occa)
    jbb = 0.5 * np.einsum('xi,ij,xj->x', occb, jdiag, occb)
    kaa = 0.5 * np.einsum('xi,ij,xj->x', occa, kdiag, occa)
    kbb = 0.5 * np.einsum('xi,ij,xj->x', occb, kdiag, occb)
    jab = occa @ jdiag @ occb.T
    hdiag = (e1a + jaa - kaa)[:, None] + (e1b + jbb - kbb)[None, :] + jab
    return hdiag.ravel()


def kernel(h1e, eri, norb, nelec, ecore=0.0, nroots=1, ci0=None,
           max_cycle=100, tol=1e-10):
    """Solve for the lowest FCI eigenstate(s). Returns (e, fcivec)."""
    na_e, nb_e = _unpack_nelec(nelec)
    na = cistring.num_strings(norb, na_e)
    nb = cistring.num_strings(norb, nb_e)
    h2e = absorb_h1e(h1e, eri, norb, nelec, 0.5)
    h2e_mat = jnp.asarray(h2e.reshape(norb * norb, norb * norb))
    Ia, pqa, Ja, sa = _flat_links(norb, na_e, na)
    Ib, pqb, Jb, sb = _flat_links(norb, nb_e, nb)
    links = tuple(jnp.asarray(x) for x in (Ia, pqa, Ja, sa, Ib, pqb, Jb, sb))

    def matvec(x):
        return _contract_2e(h2e_mat, x.reshape(na, nb), links,
                            norb, na, nb).ravel()

    hdiag = make_hdiag(h1e, eri, norb, nelec)
    if ci0 is None:
        # one seed per requested root (lowest diagonal entries) so the
        # Davidson subspace reaches every sector from the start
        nseed = min(nroots, na * nb)
        order = np.argsort(np.asarray(hdiag))
        x0 = np.zeros((nseed, na * nb))
        for i in range(nseed):
            x0[i, order[i]] = 1.0
    else:
        x0 = np.asarray(ci0)
        if x0.size == na * nb:
            x0 = x0.ravel()
        else:                       # stacked multi-root guess
            x0 = x0.reshape(-1, na * nb)
    e, vecs, conv = davidson(matvec, x0, neig=nroots, max_cycle=max_cycle,
                             tol=tol, hdiag=hdiag)
    if nroots == 1:
        return float(e[0]) + ecore, vecs[0].reshape(na, nb)
    return np.asarray(e) + ecore, [v.reshape(na, nb) for v in vecs]


# ---------------------------------------------------------------------------
# RDMs
# ---------------------------------------------------------------------------

def _t1_tensor(ci0, norb, nelec):
    """t1[p*norb+q, A, B] = (E_pq ci0)[A, B]."""
    na_e, nb_e = _unpack_nelec(nelec)
    na = cistring.num_strings(norb, na_e)
    nb = cistring.num_strings(norb, nb_e)
    Ia, pqa, Ja, sa = _flat_links(norb, na_e, na)
    Ib, pqb, Jb, sb = _flat_links(norb, nb_e, nb)
    c = jnp.asarray(ci0).reshape(na, nb)
    n2 = norb * norb
    t1 = jnp.zeros((n2, na, nb))
    t1 = t1.at[pqa, Ja, :].add(sa[:, None] * c[Ia, :])
    t1 = t1.at[pqb, :, Jb].add((sb[:, None] * c[:, Ib].T))
    return t1, c


def make_rdm1(ci0, norb, nelec):
    t1, c = _t1_tensor(ci0, norb, nelec)
    dm1 = jnp.einsum('pAB,AB->p', t1, c).reshape(norb, norb)
    return np.asarray(dm1)


def make_rdm12(ci0, norb, nelec):
    """(dm1, dm2) with dm2 in chemists' convention:
    E2 = 1/2 sum_pqrs (pq|rs) dm2[p,q,r,s]."""
    t1, c = _t1_tensor(ci0, norb, nelec)
    n2 = norb * norb
    dm1 = np.asarray(jnp.einsum('pAB,AB->p', t1, c)).reshape(norb, norb)
    # <E_pq E_rs> = <E_qp c | E_rs c>
    g = np.asarray(
        (t1.reshape(n2, -1) @ t1.reshape(n2, -1).T))
    g = g.reshape(norb, norb, norb, norb)
    epqrs = g.transpose(1, 0, 2, 3)        # <E_pq E_rs> from <E_qp|...E_rs>
    dm2 = epqrs.copy()
    for q in range(norb):
        dm2[:, q, q, :] -= dm1
    return dm1, dm2
