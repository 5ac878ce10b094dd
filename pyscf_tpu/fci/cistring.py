"""Determinant-string algebra for FCI (analog of reference
pyscf/fci/cistring.py:26 make_strings, :196 gen_linkstr_index).

Strings are bitmasks over norb orbitals; link tables are precomputed
numpy index arrays consumed by the JAX sigma contraction as gathers.
"""
from functools import lru_cache
from itertools import combinations

import numpy as np


@lru_cache(maxsize=None)
def make_strings(norb, nelec):
    """All nelec-in-norb occupation bitstrings, in the standard order."""
    if nelec == 0:
        return np.array([0], dtype=np.int64)
    strs = []
    for occ in combinations(range(norb), nelec):
        s = 0
        for o in occ:
            s |= (1 << o)
        strs.append(s)
    return np.array(sorted(strs), dtype=np.int64)


def num_strings(norb, nelec):
    from math import comb
    return comb(norb, nelec)


@lru_cache(maxsize=None)
def _addr_map(norb, nelec):
    strs = make_strings(norb, nelec)
    return {int(s): i for i, s in enumerate(strs)}


def str2addr(norb, nelec, string):
    return _addr_map(norb, nelec)[int(string)]


@lru_cache(maxsize=None)
def gen_linkstr_index(norb, nelec):
    """Link table: for each string I, all single excitations a+_p a_q.

    Returns int32 array (nstr, nlink, 4) of (p, q, J, sign) such that
    E_pq |I> = sign |J>, including diagonal p==q occupations.
    nlink = nelec * (norb - nelec) + nelec.
    """
    strs = make_strings(norb, nelec)
    addr = _addr_map(norb, nelec)
    nlink = nelec * (norb - nelec) + nelec
    tab = np.zeros((len(strs), nlink, 4), dtype=np.int32)
    for i, s in enumerate(strs):
        occ = [o for o in range(norb) if (s >> o) & 1]
        vir = [o for o in range(norb) if not (s >> o) & 1]
        k = 0
        for o in occ:                      # diagonal E_oo
            tab[i, k] = (o, o, i, 1)
            k += 1
        for q in occ:
            for p in vir:                  # E_pq: q -> p
                s1 = (s & ~(1 << q)) | (1 << p)
                # sign: parity of electrons between p and q
                lo, hi = (p, q) if p < q else (q, p)
                nperm = bin(s >> (lo + 1) & ((1 << (hi - lo - 1)) - 1)).count('1')
                tab[i, k] = (p, q, addr[int(s1)], (-1) ** nperm)
                k += 1
    return tab
