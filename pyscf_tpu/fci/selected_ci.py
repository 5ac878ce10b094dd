"""Selected CI (determinant selection + variational diagonalization + PT2).

Reference analog: pyscf/fci/selected_ci.py (kernel, enlarge_space,
C select_ci.c contraction). Redesigned as heat-bath-style selection:
determinants connected to the current variational space are added when
|H_ai c_i| exceeds the selection threshold; the variational problem is
solved in the selected space by dense diagonalization (small spaces) or
Davidson, and an Epstein-Nesbet PT2 correction over the discarded
connections is available.

Determinants are (alpha_string, beta_string) bit-pair tuples; matrix
elements come from the Slater-Condon rules over (h1e, eri).
"""
from itertools import combinations

import numpy as np

from . import cistring


def _occ_list(s, norb):
    return [p for p in range(norb) if (s >> p) & 1]


def _parity(s, p, q):
    """Sign of a_p^+ a_q applied to |s> (q occupied, p empty after removal).
    Convention: count occupied orbitals strictly between p and q."""
    if p == q:
        return 1.0
    lo, hi = (p, q) if p < q else (q, p)
    mask = ((1 << hi) - 1) ^ ((1 << (lo + 1)) - 1)
    return -1.0 if bin(s & mask).count('1') % 2 else 1.0


def h_elem(deti, detj, h1e, eri, norb):
    """<det_i|H|det_j> by Slater-Condon. dets are (stra, strb)."""
    sa_i, sb_i = deti
    sa_j, sb_j = detj
    da = sa_i ^ sa_j
    db = sb_i ^ sb_j
    na = bin(da).count('1')
    nb = bin(db).count('1')
    if na + nb > 4:
        return 0.0
    occ_a = _occ_list(sa_j, norb)
    occ_b = _occ_list(sb_j, norb)
    if na + nb == 0:
        e = sum(h1e[p, p] for p in occ_a) + sum(h1e[p, p] for p in occ_b)
        for i, p in enumerate(occ_a):
            for q in occ_a[i + 1:]:
                e += eri[p, p, q, q] - eri[p, q, q, p]
            for q in occ_b:
                e += eri[p, p, q, q]
        for i, p in enumerate(occ_b):
            for q in occ_b[i + 1:]:
                e += eri[p, p, q, q] - eri[p, q, q, p]
        return e
    if na == 2 and nb == 0:
        p = (da & sa_i).bit_length() - 1 if bin(da & sa_i).count('1') == 1 \
            else None
        # single alpha excitation q(in j) -> p(in i)
        q = (da & sa_j).bit_length() - 1
        p = (da & sa_i).bit_length() - 1
        sign = _parity(sa_j, p, q)
        e = h1e[p, q]
        for r in occ_a:
            if r == q:
                continue
            e += eri[p, q, r, r] - eri[p, r, r, q]
        for r in occ_b:
            e += eri[p, q, r, r]
        return sign * e
    if na == 0 and nb == 2:
        q = (db & sb_j).bit_length() - 1
        p = (db & sb_i).bit_length() - 1
        sign = _parity(sb_j, p, q)
        e = h1e[p, q]
        for r in occ_b:
            if r == q:
                continue
            e += eri[p, q, r, r] - eri[p, r, r, q]
        for r in occ_a:
            e += eri[p, q, r, r]
        return sign * e
    if na == 2 and nb == 2:
        qa = (da & sa_j).bit_length() - 1
        pa = (da & sa_i).bit_length() - 1
        qb = (db & sb_j).bit_length() - 1
        pb = (db & sb_i).bit_length() - 1
        sign = _parity(sa_j, pa, qa) * _parity(sb_j, pb, qb)
        return sign * eri[pa, qa, pb, qb]
    if na == 4 and nb == 0:
        qs = _occ_list(da & sa_j, norb)    # removed (ascending)
        ps = _occ_list(da & sa_i, norb)    # added (ascending)
        q1, q2 = qs
        p1, p2 = ps
        # apply a_q2 a_q1 then a+_p1 a+_p2 keeping ascending order
        s1 = sa_j & ~(1 << q1) & ~(1 << q2)
        sign = _parity(sa_j, q1, q1) if False else 1.0
        # sign: remove q2 then q1 from sa_j, add p1 then p2
        def rm(s, q):
            mask = (1 << q) - 1
            return (-1.0 if bin(s & mask).count('1') % 2 else 1.0,
                    s & ~(1 << q))
        def ad(s, p):
            mask = (1 << p) - 1
            return (-1.0 if bin(s & mask).count('1') % 2 else 1.0,
                    s | (1 << p))
        sg, s = rm(sa_j, q2)
        sg2, s = rm(s, q1)
        sg3, s = ad(s, p1)
        sg4, s = ad(s, p2)
        sign = sg * sg2 * sg3 * sg4
        return sign * (eri[p1, q1, p2, q2] - eri[p2, q1, p1, q2])
    if na == 0 and nb == 4:
        qs = _occ_list(db & sb_j, norb)
        ps = _occ_list(db & sb_i, norb)
        q1, q2 = qs
        p1, p2 = ps
        def rm(s, q):
            mask = (1 << q) - 1
            return (-1.0 if bin(s & mask).count('1') % 2 else 1.0,
                    s & ~(1 << q))
        def ad(s, p):
            mask = (1 << p) - 1
            return (-1.0 if bin(s & mask).count('1') % 2 else 1.0,
                    s | (1 << p))
        sg, s = rm(sb_j, q2)
        sg2, s = rm(s, q1)
        sg3, s = ad(s, p1)
        sg4, s = ad(s, p2)
        sign = sg * sg2 * sg3 * sg4
        return sign * (eri[p1, q1, p2, q2] - eri[p2, q1, p1, q2])
    return 0.0


def _connected(det, norb):
    """All singly/doubly excited determinants of det (same spin sectors)."""
    sa, sb = det
    occ_a, occ_b = _occ_list(sa, norb), _occ_list(sb, norb)
    vir_a = [p for p in range(norb) if not (sa >> p) & 1]
    vir_b = [p for p in range(norb) if not (sb >> p) & 1]
    out = []
    for q in occ_a:
        for p in vir_a:
            out.append((sa ^ (1 << q) | (1 << p), sb))
    for q in occ_b:
        for p in vir_b:
            out.append((sa, sb ^ (1 << q) | (1 << p)))
    for q1, q2 in combinations(occ_a, 2):
        for p1, p2 in combinations(vir_a, 2):
            out.append((sa ^ (1 << q1) ^ (1 << q2) | (1 << p1) | (1 << p2),
                        sb))
    for q1, q2 in combinations(occ_b, 2):
        for p1, p2 in combinations(vir_b, 2):
            out.append((sa,
                        sb ^ (1 << q1) ^ (1 << q2) | (1 << p1) | (1 << p2)))
    for qa in occ_a:
        for pa in vir_a:
            for qb in occ_b:
                for pb in vir_b:
                    out.append((sa ^ (1 << qa) | (1 << pa),
                                sb ^ (1 << qb) | (1 << pb)))
    return out


def _build_h(dets, h1e, eri, norb):
    n = len(dets)
    H = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1):
            v = h_elem(dets[i], dets[j], h1e, eri, norb)
            H[i, j] = H[j, i] = v
    return H


def kernel(h1e, eri, norb, nelec, ecore=0.0, select_cutoff=1e-4,
           max_iter=20, conv_tol=1e-10, max_det=200000, verbose=0):
    """Selected CI ground state.

    Returns (e_tot, (dets, civec)). eri must be the full 4-index array
    (pq|rs). select_cutoff -> 0 recovers FCI.
    """
    h1e = np.asarray(h1e)
    eri = np.asarray(eri).reshape(norb, norb, norb, norb)
    na, nb = nelec if isinstance(nelec, (tuple, list)) else (
        (nelec + 1) // 2, nelec // 2)
    hf = (int((1 << na) - 1), int((1 << nb) - 1))
    dets = [hf]
    c = np.array([1.0])
    e_prev = None
    for it in range(max_iter):
        # selection: connected dets with |H_ai c_i| > cutoff
        det_set = set(dets)
        new = set()
        for ci, det in zip(c, dets):
            if abs(ci) < select_cutoff * 0.1:
                continue
            for cand in _connected(det, norb):
                if cand in det_set or cand in new:
                    continue
                if abs(h_elem(cand, det, h1e, eri, norb) * ci) \
                        > select_cutoff:
                    new.add(cand)
        if new:
            dets = dets + sorted(new)
        if len(dets) > max_det:
            raise RuntimeError('selected space exceeded max_det')
        H = _build_h(dets, h1e, eri, norb)
        w, v = np.linalg.eigh(H)
        e, c = w[0], v[:, 0]
        if verbose:
            print(f'SCI iter {it}: ndet={len(dets)} E={e + ecore:.10f}')
        if not new and e_prev is not None and abs(e - e_prev) < conv_tol:
            break
        if e_prev is not None and abs(e - e_prev) < conv_tol and not new:
            break
        if not new:
            break
        e_prev = e
    return e + ecore, (dets, c)


def energy_pt2(dets, c, e_var, h1e, eri, norb, ecore=0.0):
    """Epstein-Nesbet PT2 correction over discarded connections."""
    h1e = np.asarray(h1e)
    eri = np.asarray(eri).reshape(norb, norb, norb, norb)
    det_set = set(dets)
    contrib = {}
    for ci, det in zip(c, dets):
        for cand in _connected(det, norb):
            if cand in det_set:
                continue
            v = h_elem(cand, det, h1e, eri, norb)
            if v != 0.0:
                contrib[cand] = contrib.get(cand, 0.0) + v * ci
    e0 = e_var - ecore
    e2 = 0.0
    for cand, num in contrib.items():
        haa = h_elem(cand, cand, h1e, eri, norb)
        e2 += num * num / (e0 - haa)
    return e2


class SelectedCI:
    """SCI solver with an FCISolver-like interface
    (reference fci/selected_ci.py SelectedCI / SCI)."""

    def __init__(self, select_cutoff=1e-4):
        self.select_cutoff = select_cutoff
        self.e_pt2 = None

    def kernel(self, h1e, eri, norb, nelec, ecore=0.0, **kwargs):
        e, (dets, c) = kernel(h1e, eri, norb, nelec, ecore=ecore,
                              select_cutoff=self.select_cutoff, **kwargs)
        self.dets, self.ci = dets, c
        self.e_var = e
        self.e_pt2 = energy_pt2(dets, c, e, h1e, eri, norb, ecore=ecore)
        return e, (dets, c)
