#!/usr/bin/env python
"""Derive the spin-orbital CCSDTQ residual coefficients against the exact
Fock-space oracle (companion to fit_cc_equations.py — see there).

Determines (a) the T4 contributions to R2/R3 and (b) the complete R4
residual.  Term basis enumerated from connected-diagram line counting:
R4 receives [W,T3], [f+W,T4], [[W,T2],T3], [[W,T3],T3], [[W,T2],T4],
[[W,T2],T2] (via vvvv/oooo/ovvo) and (1/6)[[[W,T2],T2],T2] (via oovv).
Coefficients fixed by least squares on random non-hermitian tensors over
several (nocc, nvir) sizes, verified on unseen larger sizes.

Run on CPU: python tools_dev/fit_ccsdtq_equations.py
"""
import os
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import sys
import numpy as np
from itertools import permutations

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from pyscf_tpu.cc import fock_oracle as fo
from fit_cc_equations import slices, perm_sign, R2_TERMS, R3_TERMS


def antisymmetrize(t, order):
    """Two-stage full antisymmetrization (occ block, then vir block)."""
    out = np.zeros_like(t)
    for po in permutations(range(order)):
        axes = list(po) + list(range(order, 2 * order))
        out += perm_sign(po) * t.transpose(axes)
    out2 = np.zeros_like(t)
    for pv in permutations(range(order)):
        axes = list(range(order)) + [order + q for q in pv]
        out2 += perm_sign(pv) * out.transpose(axes)
    return out2


R2_T4_TERMS = R2_TERMS + [
    ('t4_w', 'mnef,ijmnabef->ijab', ('w_oovv', 't4')),
]

R3_T4_TERMS = R3_TERMS + [
    ('t4_f',  'me,ijkmabce->ijkabc',   ('f_ov', 't4')),
    ('t4_wv', 'maef,ijkmbcef->ijkabc', ('w_ovvv', 't4')),
    ('t4_wo', 'mnie,jkmnabce->ijkabc', ('w_ooov', 't4')),
]

R4_TERMS = [
    # --- linear t3: [W, T3] ---
    ('L3v',  'abei,jklcde->ijklabcd',          ('w_vvvo', 't3')),
    ('L3o',  'majk,ilmbcd->ijklabcd',          ('w_ovoo', 't3')),
    # --- linear t4: [f+W, T4] ---
    ('L4fv', 'ae,ijklebcd->ijklabcd',          ('f_vv', 't4')),
    ('L4fo', 'mi,mjklabcd->ijklabcd',          ('f_oo', 't4')),
    ('L4vv', 'abef,ijklefcd->ijklabcd',        ('w_vvvv', 't4')),
    ('L4oo', 'mnij,mnklabcd->ijklabcd',        ('w_oooo', 't4')),
    ('L4ov', 'maei,mjklebcd->ijklabcd',        ('w_ovvo', 't4')),
    # --- t2*t3 via W_ovvv (contract m,e,f; external a) ---
    ('QA1', 'maef,ijbe,klmcdf->ijklabcd',      ('w_ovvv', 't2', 't3')),
    ('QA2', 'maef,imbc,jkldef->ijklabcd',      ('w_ovvv', 't2', 't3')),
    ('QA3', 'maef,ijef,klmbcd->ijklabcd',      ('w_ovvv', 't2', 't3')),
    ('QA4', 'maef,imbe,jklcdf->ijklabcd',      ('w_ovvv', 't2', 't3')),
    # --- t2*t3 via W_ooov (contract m,n,e; external i) ---
    ('QB1', 'mnie,jmab,klncde->ijklabcd',      ('w_ooov', 't2', 't3')),
    ('QB2', 'mnie,jkae,lmnbcd->ijklabcd',      ('w_ooov', 't2', 't3')),
    ('QB3', 'mnie,mnab,jklcde->ijklabcd',      ('w_ooov', 't2', 't3')),
    ('QB4', 'mnie,jmae,klnbcd->ijklabcd',      ('w_ooov', 't2', 't3')),
    # --- t2*t3 via f_ov ---
    ('QF1', 'me,ijae,klmbcd->ijklabcd',        ('f_ov', 't2', 't3')),
    ('QF2', 'me,imab,jklcde->ijklabcd',        ('f_ov', 't2', 't3')),
    # --- t3*t3 via W_oovv ---
    ('QT1', 'mnef,imnabc,jkldef->ijklabcd',    ('w_oovv', 't3', 't3')),
    ('QT2', 'mnef,ijmabe,klncdf->ijklabcd',    ('w_oovv', 't3', 't3')),
    ('QT3', 'mnef,imnabe,jklcdf->ijklabcd',    ('w_oovv', 't3', 't3')),
    ('QT4', 'mnef,ijmaef,klnbcd->ijklabcd',    ('w_oovv', 't3', 't3')),
    # --- t2*t4 via W_oovv ---
    ('QQ1', 'mnef,ijae,klmnbcdf->ijklabcd',    ('w_oovv', 't2', 't4')),
    ('QQ2', 'mnef,imab,jklncdef->ijklabcd',    ('w_oovv', 't2', 't4')),
    ('QQ3', 'mnef,ijef,klmnabcd->ijklabcd',    ('w_oovv', 't2', 't4')),
    ('QQ4', 'mnef,mnab,ijklcdef->ijklabcd',    ('w_oovv', 't2', 't4')),
    ('QQ5', 'mnef,imae,jklnbcdf->ijklabcd',    ('w_oovv', 't2', 't4')),
    ('QQ6', 'mnef,mnaf,ijklbcde->ijklabcd',    ('w_oovv', 't2', 't4')),
    ('QQ7', 'mnef,imef,jklnabcd->ijklabcd',    ('w_oovv', 't2', 't4')),
    # --- t2*t2*t2 via W_oovv ---
    ('C1',  'mnef,ijef,kmab,lncd->ijklabcd',   ('w_oovv', 't2', 't2', 't2')),
    ('C2',  'mnef,mnab,ijce,kldf->ijklabcd',   ('w_oovv', 't2', 't2', 't2')),
    ('C3',  'mnef,imae,jnbc,kldf->ijklabcd',   ('w_oovv', 't2', 't2', 't2')),
    # --- t2*t2 via W_vvvv / W_oooo / W_ovvo ---
    ('D1',  'abef,ijce,kldf->ijklabcd',        ('w_vvvv', 't2', 't2')),
    ('D2',  'mnij,kmab,lncd->ijklabcd',        ('w_oooo', 't2', 't2')),
    ('D3',  'maei,jmbc,klde->ijklabcd',        ('w_ovvo', 't2', 't2')),
]


def random_t4(nocc, nvir, seed):
    rng = np.random.RandomState(seed + 1000)
    t4 = rng.uniform(-1, 1, (nocc,) * 4 + (nvir,) * 4)
    return antisymmetrize(t4, 4) / 576.0


def term_values(terms, ops, order):
    cols = []
    for name, spec, keys in terms:
        val = np.einsum(spec, *[ops[k] for k in keys], optimize=True)
        cols.append(antisymmetrize(val, order).ravel())
    return np.stack(cols, axis=1)


def _assemble(terms, order, project, configs):
    A_rows, b_rows = [], []
    for nocc, nvir, seed in configs:
        f, w, _, t2, t3 = fo.random_problem(nocc, nvir, seed=seed)
        t4 = random_t4(nocc, nvir, seed)
        ops = dict(slices(f, w, nocc))
        ops.update(t2=t2, t3=t3, t4=t4)
        A_rows.append(term_values(terms, ops, order))
        vec = fo.similarity_residual(f, w, nocc, t2=t2, t3=t3, t4=t4)
        b_rows.append(project(vec, nocc + nvir, nocc).ravel())
    return np.concatenate(A_rows, axis=0), np.concatenate(b_rows)


FIT_CONFIGS = [(4, 4, 0), (5, 4, 1), (4, 5, 2), (5, 5, 3), (6, 5, 4),
               (5, 6, 5)]
VERIFY_CONFIGS = [(6, 6, 11), (7, 4, 12), (4, 7, 13)]


def fit(terms, order, project):
    from scipy.linalg import qr
    A, b = _assemble(terms, order, project, FIT_CONFIGS)
    _, R, piv = qr(A, mode='economic', pivoting=True)
    tol = abs(R[0, 0]) * 1e-10
    rank = int(np.sum(np.abs(np.diag(R)) > tol))
    keep = sorted(piv[:rank])
    coef = np.zeros(len(terms))
    sol, _, _, _ = np.linalg.lstsq(A[:, keep], b, rcond=None)
    coef[keep] = sol
    resid = np.abs(A @ coef - b).max()
    Av, bv = _assemble(terms, order, project, VERIFY_CONFIGS)
    vresid = np.abs(Av @ coef - bv).max()
    return coef, resid, vresid, rank


def main():
    for label, terms, order, project in [
            ('R2+T4', R2_T4_TERMS, 2, fo.project_doubles),
            ('R3+T4', R3_T4_TERMS, 3, fo.project_triples),
            ('R4', R4_TERMS, 4, fo.project_quadruples)]:
        coef, resid, vresid, rank = fit(terms, order, project)
        print(f'=== {label}:  max|fit residual| = {resid:.3e}  '
              f'verify(unseen) = {vresid:.3e}  rank {rank}/{len(terms)}')
        for (name, spec, keys), c in zip(terms, coef):
            print(f'  {name:8s} {spec:36s} coeff = {c:+.10f} '
                  f'(x576 = {c * 576:+.4f})')


if __name__ == '__main__':
    main()
