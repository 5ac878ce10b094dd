"""FCI reduced density matrices beyond (dm1, dm2): spin-resolved,
transition, and 3-particle RDMs.

Reference analog: pyscf/fci/rdm.py (C kernels lib/mcscf/fci_rdm.c,
fci_4pdm.c). Here every density is a GEMM between operator-applied CI
tensors t1[pq] = E_pq|ci> built from the flattened link tables — the same
device-friendly primitive direct_spin1 uses for the sigma vector.

Conventions (matching the reference after its reorder_* helpers):
  dm1[p,q]       = <bra| p^+ q |ket>
  dm2[p,q,r,s]   = <bra| p^+ r^+ s q |ket>   (chemists' pair order)
  dm3[p,q,r,s,t,u] = <bra| p^+ r^+ t^+ u s q |ket>
"""
import jax.numpy as jnp
import numpy as np

from . import cistring
from .direct_spin1 import _unpack_nelec, _flat_links, _t1_tensor


def _t1_spin(ci0, norb, nelec):
    """Spin-resolved t1: (t1a, t1b) with t1x[pq, A, B] = E^x_pq ci."""
    na_e, nb_e = _unpack_nelec(nelec)
    na = cistring.num_strings(norb, na_e)
    nb = cistring.num_strings(norb, nb_e)
    Ia, pqa, Ja, sa = _flat_links(norb, na_e, na)
    Ib, pqb, Jb, sb = _flat_links(norb, nb_e, nb)
    c = jnp.asarray(ci0).reshape(na, nb)
    n2 = norb * norb
    t1a = jnp.zeros((n2, na, nb)).at[pqa, Ja, :].add(sa[:, None] * c[Ia, :])
    t1b = jnp.zeros((n2, na, nb)).at[pqb, :, Jb].add(sb[:, None] * c[:, Ib].T)
    return t1a, t1b, c


def make_rdm1s(ci0, norb, nelec):
    """(dm1a, dm1b) spin-resolved one-particle densities."""
    t1a, t1b, c = _t1_spin(ci0, norb, nelec)
    dma = np.asarray(jnp.einsum('pAB,AB->p', t1a, c)).reshape(norb, norb)
    dmb = np.asarray(jnp.einsum('pAB,AB->p', t1b, c)).reshape(norb, norb)
    return dma, dmb


def trans_rdm1(cibra, ciket, norb, nelec):
    """dm1[p,q] = <bra|E_pq|ket>."""
    t1, ck = _t1_tensor(ciket, norb, nelec)
    cb = jnp.asarray(cibra).reshape(ck.shape)
    return np.asarray(jnp.einsum('pAB,AB->p', t1, cb)).reshape(norb, norb)


def trans_rdm1s(cibra, ciket, norb, nelec):
    t1a, t1b, ck = _t1_spin(ciket, norb, nelec)
    cb = jnp.asarray(cibra).reshape(ck.shape)
    dma = np.asarray(jnp.einsum('pAB,AB->p', t1a, cb)).reshape(norb, norb)
    dmb = np.asarray(jnp.einsum('pAB,AB->p', t1b, cb)).reshape(norb, norb)
    return dma, dmb


def trans_rdm12(cibra, ciket, norb, nelec):
    """(dm1, dm2) transition densities, dm2 normal-ordered as in the
    module docstring: <E_pq E_rs> = <E_qp bra | E_rs ket>."""
    t1k, ck = _t1_tensor(ciket, norb, nelec)
    t1b, cb = _t1_tensor(cibra, norb, nelec)
    n2 = norb * norb
    dm1 = np.asarray(jnp.einsum('pAB,AB->p', t1k,
                                jnp.asarray(cibra).reshape(ck.shape)))
    dm1 = dm1.reshape(norb, norb)
    g = np.asarray(t1b.reshape(n2, -1) @ t1k.reshape(n2, -1).T)
    g = g.reshape(norb, norb, norb, norb)
    epqrs = g.transpose(1, 0, 2, 3)
    dm2 = epqrs.copy()
    for q in range(norb):
        dm2[:, q, q, :] -= dm1
    return dm1, dm2


def _apply_epq_all(t, norb, nelec):
    """Apply E_pq for all pq to one CI matrix t (na, nb) -> (n2, na, nb)."""
    na_e, nb_e = _unpack_nelec(nelec)
    na = cistring.num_strings(norb, na_e)
    nb = cistring.num_strings(norb, nb_e)
    Ia, pqa, Ja, sa = _flat_links(norb, na_e, na)
    Ib, pqb, Jb, sb = _flat_links(norb, nb_e, nb)
    t = jnp.asarray(t).reshape(na, nb)
    n2 = norb * norb
    out = jnp.zeros((n2, na, nb))
    out = out.at[pqa, Ja, :].add(sa[:, None] * t[Ia, :])
    out = out.at[pqb, :, Jb].add(sb[:, None] * t[:, Ib].T)
    return out


def make_rdm123(ci0, norb, nelec):
    """(dm1, dm2, dm3) — all normal-ordered (docstring conventions).

    Memory: the intermediate t2[pq, rs, A, B] is norb^4 * ndet doubles —
    fine for active spaces (norb <= 10); the reference's C 3-PDM kernel
    (lib/mcscf/fci_rdm.c) has the same scaling.
    """
    na_e, nb_e = _unpack_nelec(nelec)
    na = cistring.num_strings(norb, na_e)
    nb = cistring.num_strings(norb, nb_e)
    n2 = norb * norb
    t1, c = _t1_tensor(ci0, norb, nelec)        # (n2, na, nb)
    # G2[pq, rs] = <E_qp c | E_rs c> -> <E_pq E_rs>
    g2 = np.asarray(t1.reshape(n2, -1) @ t1.reshape(n2, -1).T)
    g2 = g2.reshape(norb, norb, norb, norb).transpose(1, 0, 2, 3)
    dm1 = np.asarray(jnp.einsum('pAB,AB->p', t1, c)).reshape(norb, norb)
    dm2 = g2.copy()
    for q in range(norb):
        dm2[:, q, q, :] -= dm1

    # t2[rs, tu, A, B] = E_rs E_tu |c>
    t2 = np.zeros((n2, n2, na, nb))
    for tu in range(n2):
        t2[:, tu] = np.asarray(_apply_epq_all(t1[tu], norb, nelec))
    t2 = t2.reshape(n2, n2, -1)
    # G3[pq, rs, tu] = <E_qp c | E_rs E_tu c>
    t1f = np.asarray(t1).reshape(n2, -1)
    g3 = np.einsum('px,rtx->prt', t1f, t2)
    g3 = g3.reshape((norb,) * 6)
    g3 = g3.transpose(1, 0, 2, 3, 4, 5)         # qp -> pq on the bra side

    # normal-order via the spin-free recursion
    #   e3[pq,rs,tu] = E_pq e2[rs,tu] - d_qr e2[ps,tu] - d_qt e2[rs,pu]
    # expanded against the raw G3 = <E_pq E_rs E_tu>:
    #   dm3 = G3 - d_st G2[pq,ru] - d_qr dm2[ps,tu] - d_qt dm2[rs,pu]
    # (validated element-wise against explicit apply_op in tests/test_fci.py)
    dm3 = g3.copy()
    for s in range(norb):
        dm3[:, :, :, s, s, :] -= g2
    for q in range(norb):
        dm3[:, q, q, :, :, :] -= dm2
    m = dm2.transpose(2, 0, 1, 3)               # m[p,r,s,u] = dm2[r,s,p,u]
    for q in range(norb):
        dm3[:, q, :, :, q, :] -= m
    return dm1, dm2, dm3


def make_rdm1234(ci0, norb, nelec):
    """(dm1, dm2, dm3, dm4), all normal-ordered:
    dm4[p,q,r,s,t,u,v,w] = <p+ r+ t+ v+ w u s q>.

    Memory: the t2 stack is norb^4 * ndet doubles (reference analog:
    pyscf/fci/rdm.py make_dm1234 via lib/mcscf/fci_4pdm.c).
    """
    na_e, nb_e = _unpack_nelec(nelec)
    na = cistring.num_strings(norb, na_e)
    nb = cistring.num_strings(norb, nb_e)
    n2 = norb * norb
    dm1, dm2, dm3 = make_rdm123(ci0, norb, nelec)
    t1, c = _t1_tensor(ci0, norb, nelec)
    t1f = np.asarray(t1).reshape(n2, -1)
    t2 = np.zeros((n2, n2, na * nb))
    for tu in range(n2):
        t2[:, tu] = np.asarray(
            _apply_epq_all(t1[tu], norb, nelec)).reshape(n2, -1)
    t2f = t2.reshape(n2 * n2, -1)
    # raw strings: G2 = <E_pq E_rs>, G3 = <E_pq E_rs E_tu>,
    # G4[pq,rs,tu,vw] = <E_sr E_qp c | E_tu E_vw c>
    g2 = (t1f @ t1f.T).reshape((norb,) * 4).transpose(1, 0, 2, 3)
    g3 = (t1f @ t2f.T).reshape((norb,) * 6).transpose(1, 0, 2, 3, 4, 5)
    g4 = (t2f @ t2f.T).reshape((norb,) * 8)
    # t2[ab, cd] applies E_ab E_cd; bra side needs E_sr E_qp -> index
    # [s, r, q, p] on the first four axes
    g4 = g4.transpose(3, 2, 1, 0, 4, 5, 6, 7)   # -> [p,q,r,s,tu,vw]

    # normal-order via the spin-free recursion
    #   e4[pq,rs,tu,vw] = E_pq e3[rs,tu,vw] - d_qr e3[ps,tu,vw]
    #                     - d_qt e3[rs,pu,vw] - d_qv e3[rs,tu,pw]
    # expanded against the raw strings (element-wise validated in
    # tests/test_fci_extras.py):
    #   dm4 = G4 - d_uv G3[pq,rs,tw]
    #         - d_st G3[pq,ru,vw] + d_st d_uv G2[pq,rw]
    #         - d_sv G3[pq,tu,rw] + d_sv d_ur G2[pq,tw]
    #         - d_qr dm3[ps,tu,vw] - d_qt dm3[rs,pu,vw] - d_qv dm3[rs,tu,pw]
    dm4 = g4.copy()
    for u in range(norb):
        dm4[:, :, :, :, :, u, u, :] -= g3
    for s in range(norb):
        dm4[:, :, :, s, s, :, :, :] -= g3
    for s in range(norb):
        for u in range(norb):
            dm4[:, :, :, s, s, u, u, :] += g2
    m = g3.transpose(0, 1, 4, 2, 3, 5)      # m[p,q,r,t,u,w] = g3[p,q,t,u,r,w]
    for s in range(norb):
        dm4[:, :, :, s, :, :, s, :] -= m
    for s in range(norb):
        for u in range(norb):
            dm4[:, :, u, s, :, u, s, :] += g2
    for q in range(norb):
        dm4[:, q, q, :, :, :, :, :] -= dm3
    m = dm3.transpose(2, 0, 1, 3, 4, 5)     # m[p,r,s,u,v,w] = dm3[r,s,p,u,v,w]
    for q in range(norb):
        dm4[:, q, :, :, q, :, :, :] -= m
    m = dm3.transpose(4, 0, 1, 2, 3, 5)     # m[p,r,s,t,u,w] = dm3[r,s,t,u,p,w]
    for q in range(norb):
        dm4[:, q, :, :, :, :, q, :] -= m
    return dm1, dm2, dm3, dm4
