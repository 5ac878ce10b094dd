"""AutoAux: automatic even-tempered auxiliary basis generation.

Re-implementation of the ORCA AutoAux scheme (Stoychev, Auer, Neese,
JCTC 13, 554 (2017)); reference analog pyscf/df/autoaux.py.  Given the
orbital basis of each element, produce an even-tempered fitting set that
spans the exponent range of all AO product pairs per auxiliary angular
momentum.
"""
from math import factorial, gamma, log, ceil, pi

import numpy as np

from ..gto import basis as basis_mod
from ..data import elements

F_LAUX = np.array([20.0, 7.0, 4.0, 4.0, 3.5, 2.5, 2.0, 2.0])
BETA_BIG = np.array([1.8, 2.0, 2.2, 2.2, 2.2, 2.3, 3.0, 3.0])
BETA_SMALL = 1.8


def _gaussian_int(n, alpha):
    """\\int_0^inf r^n exp(-alpha r^2) dr."""
    n1 = (n + 1) * 0.5
    return gamma(n1) / (2.0 * np.power(alpha, n1))


def _gto_norm(l, a):
    """Radial norm of a primitive r^l Gaussian (reference gto.gto_norm)."""
    return 1.0 / np.sqrt(_gaussian_int(2 * l + 2, 2.0 * a))


def _shell_ranges(raw_basis):
    """Per l: (emax, emin, e_eff) over the element's shells.

    e_eff is the effective single-Gaussian exponent of each contraction,
    from its radial expectation value <r> (Eq. 9 of the AutoAux paper,
    with the corrected prefactor)."""
    lmax = max(b[0] for b in raw_basis)
    emin = np.full(lmax + 1, np.inf)
    emax = np.zeros(lmax + 1)
    eeff = np.zeros(lmax + 1)
    for b in raw_basis:
        l = b[0]
        ec = np.array(b[1:], dtype=np.float64)
        es = ec[:, 0]
        emax[l] = max(emax[l], es.max())
        emin[l] = min(emin[l], es.min())
        cs = ec[:, 1:] * _gto_norm(l, es)[:, None]
        # normalize each contracted AO
        ee = es[:, None] + es[None, :]
        s_ints = _gaussian_int(2 * l + 2, ee)
        norms = np.einsum('pi,pq,qi->i', cs, s_ints, cs)
        cs = cs / np.sqrt(norms)[None, :]
        r_ints = _gaussian_int(2 * l + 3, ee)
        r_exp = np.einsum('pi,pq,qi->i', cs, r_ints, cs)
        k = 2.0 ** (2 * l + 1) * factorial(l + 1) ** 2 / factorial(2 * l + 2)
        e_eff = 2.0 * k ** 2 / (pi * r_exp ** 2) - 1e-8
        eeff[l] = max(eeff[l], e_eff.max())
    return emax, emin, eeff


def _etb_for_element(z, raw_basis):
    """[(l, n, alpha_min, beta)] even-tempered recipe for one element."""
    a_max, a_min, a_eff = _shell_ranges(raw_basis)
    lmax = a_max.size - 1

    if z <= 2:
        l_val = 0
    elif z <= 20:
        l_val = 1
    elif z <= 56:
        l_val = 2
    else:
        l_val = 3
    l_inc = 2 if z > 18 else 1
    l_max_aux = min(max(2 * l_val, lmax + l_inc), 2 * lmax)

    ls = np.arange(lmax + 1)
    lsum = ls[:, None] + ls[None, :]
    ldiff = np.abs(ls[:, None] - ls[None, :])
    pair_min = a_min[:, None] + a_min[None, :]
    pair_max = a_max[:, None] + a_max[None, :]
    pair_eff = a_eff[:, None] + a_eff[None, :]

    lo, hi, hi_eff = [], [], []
    for ll in range(l_max_aux + 1):
        sel = (ldiff <= ll) & (ll <= lsum)
        lo.append(pair_min[sel].min())
        hi.append(pair_max[sel].max())
        hi_eff.append(pair_eff[sel].max())

    # low-l channels (fitting valence products): cap the top exponent
    etb = []
    for ll in range(min(2 * l_val, l_max_aux) + 1):
        top = min(F_LAUX[ll] * hi_eff[ll], hi[ll])
        n = int(ceil(log(top / lo[ll]) / log(BETA_SMALL))) + 1
        if n > 0:
            etb.append((ll, n, lo[ll], BETA_SMALL))
    for ll in range(2 * l_val + 1, l_max_aux + 1):
        top = hi_eff[ll]
        n = int(ceil(log(top / lo[ll]) / log(BETA_BIG[ll]))) + 1
        if n > 0:
            etb.append((ll, n, lo[ll], BETA_BIG[ll]))
    return etb


def expand_etbs(etbs):
    """[(l, n, alpha, beta)] -> uncontracted basis entries
    [[l, [alpha*beta^i, 1.0]], ...] (reference gto.expand_etbs)."""
    out = []
    for l, n, alpha, beta in etbs:
        for i in range(n):
            out.append([l, [alpha * beta ** i, 1.0]])
    return out


def autoaux(mol):
    """{element: basis entries} auxiliary fitting basis for mol."""
    out = {}
    for symb in dict.fromkeys(mol.raw_symbols):
        if isinstance(mol.basis, dict):
            raw = mol.basis.get(symb, mol.basis.get('default'))
            if isinstance(raw, str):
                raw = basis_mod.load(raw, symb)
        elif isinstance(mol.basis, str):
            raw = basis_mod.load(mol.basis, symb)
        else:
            raw = mol.basis
        out[symb] = expand_etbs(_etb_for_element(elements.charge(symb), raw))
    return out
