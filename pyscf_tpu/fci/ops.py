"""Fermionic creation/annihilation operators on FCI vectors.

Determinant-level second quantization (reference analog: pyscf/fci/addons.py
des_a/cre_a/des_b/cre_b). The CI vector is (n_alpha_strings, n_beta_strings)
with strings as bitmasks (bit p = orbital p occupied); the wavefunction
convention is (alpha ops)(beta ops)|0> with orbital creation in ascending
bit order, so beta operators pick up a global (-1)^n_alpha phase.

These primitives back the NEVPT2 perturber construction (mrpt/nevpt2.py),
where every 1-4-body active-space density contraction of the reference's
C 4-PDM kernels (lib/mcscf/fci_rdm.c) is replaced by GEMMs over
operator-applied CI vectors.
"""
import numpy as np

from . import cistring


def _parity_below(strs, p):
    """(-1)^(number of occupied orbitals below p) for each string."""
    mask = (1 << p) - 1
    cnt = np.zeros(len(strs), dtype=np.int64)
    v = strs & mask
    while np.any(v):
        cnt += v & 1
        v >>= 1
    return 1.0 - 2.0 * (cnt & 1)


def _cre_str_map(norb, nelec, p):
    """Strings without p -> (target addr with p, phase)."""
    strs = cistring.make_strings(norb, nelec)
    has = (strs >> p) & 1
    src = np.where(has == 0)[0]
    tgt_strs = strs[src] | (1 << p)
    tgt = np.array([cistring.str2addr(norb, nelec + 1, s) for s in tgt_strs],
                   dtype=np.int64)
    ph = _parity_below(strs[src], p)
    return src, tgt, ph


def _des_str_map(norb, nelec, p):
    strs = cistring.make_strings(norb, nelec)
    has = (strs >> p) & 1
    src = np.where(has == 1)[0]
    tgt_strs = strs[src] & ~(1 << p)
    tgt = np.array([cistring.str2addr(norb, nelec - 1, s) for s in tgt_strs],
                   dtype=np.int64)
    ph = _parity_below(strs[src], p)
    return src, tgt, ph


def cre_a(ci, norb, nelec, p):
    """a+_p,alpha |ci>: (na,nb) -> (na+1,nb)."""
    na, nb = nelec
    ci = np.asarray(ci).reshape(cistring.num_strings(norb, na),
                                cistring.num_strings(norb, nb))
    src, tgt, ph = _cre_str_map(norb, na, p)
    out = np.zeros((cistring.num_strings(norb, na + 1), ci.shape[1]))
    out[tgt] = ph[:, None] * ci[src]
    return out


def des_a(ci, norb, nelec, p):
    """a_p,alpha |ci>: (na,nb) -> (na-1,nb)."""
    na, nb = nelec
    ci = np.asarray(ci).reshape(cistring.num_strings(norb, na),
                                cistring.num_strings(norb, nb))
    src, tgt, ph = _des_str_map(norb, na, p)
    out = np.zeros((cistring.num_strings(norb, na - 1), ci.shape[1]))
    out[tgt] = ph[:, None] * ci[src]
    return out


def cre_b(ci, norb, nelec, p):
    """a+_p,beta |ci>: (na,nb) -> (na,nb+1). Phase (-1)^na crossing alphas."""
    na, nb = nelec
    ci = np.asarray(ci).reshape(cistring.num_strings(norb, na),
                                cistring.num_strings(norb, nb))
    src, tgt, ph = _cre_str_map(norb, nb, p)
    out = np.zeros((ci.shape[0], cistring.num_strings(norb, nb + 1)))
    out[:, tgt] = ph[None, :] * ci[:, src]
    if na % 2:
        out = -out
    return out


def des_b(ci, norb, nelec, p):
    na, nb = nelec
    ci = np.asarray(ci).reshape(cistring.num_strings(norb, na),
                                cistring.num_strings(norb, nb))
    src, tgt, ph = _des_str_map(norb, nb, p)
    out = np.zeros((ci.shape[0], cistring.num_strings(norb, nb - 1)))
    out[:, tgt] = ph[None, :] * ci[:, src]
    if na % 2:
        out = -out
    return out


def apply_op(ci, norb, nelec, ops):
    """Apply a product of spin-orbital operators, RIGHTMOST FIRST.

    ops: sequence of (p, spin, dagger) with spin in {0:alpha, 1:beta},
    dagger bool. Returns (vec, nelec_out); vec is None when any step leaves
    the representable sector range (operator annihilates everything), with
    nelec_out still the formal final sector.
    """
    na, nb = nelec
    # formal final sector from the operator tally
    na_f, nb_f = na, nb
    for p, spin, dag in ops:
        d = 1 if dag else -1
        if spin == 0:
            na_f += d
        else:
            nb_f += d
    v = ci
    for p, spin, dag in reversed(list(ops)):
        nxt = (na + (1 if dag else -1)) if spin == 0 else na
        nxtb = (nb + (1 if dag else -1)) if spin == 1 else nb
        if not (0 <= nxt <= norb and 0 <= nxtb <= norb):
            return None, (na_f, nb_f)
        if spin == 0:
            v = cre_a(v, norb, (na, nb), p) if dag else des_a(v, norb, (na, nb), p)
        else:
            v = cre_b(v, norb, (na, nb), p) if dag else des_b(v, norb, (na, nb), p)
        na, nb = nxt, nxtb
    return v, (na, nb)
