#!/usr/bin/env python
"""Derive the spin-orbital CCSDT residual coefficients against the exact
Fock-space oracle (pyscf_tpu/cc/fock_oracle.py).

Each residual is expanded in a complete basis of contraction patterns
(enumerated from connected-diagram line counting); the coefficient of
every term is then determined by LEAST SQUARES against the exact
e^{-T} H e^{T} |0> projections on random non-hermitian tensors.  A fit
residual at machine precision certifies both completeness and the
coefficients, which are then frozen into pyscf_tpu/cc/gccsdt.py.

Run on CPU: python tools_dev/fit_cc_equations.py
"""
import os
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import numpy as np
from itertools import permutations

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from pyscf_tpu.cc import fock_oracle as fo


def perm_sign(p):
    return (-1.0) ** sum(1 for x in range(len(p))
                         for y in range(x + 1, len(p)) if p[x] > p[y])


def antisymmetrize(t, order):
    """Full antisymmetrization over leading occ block and trailing vir."""
    out = np.zeros_like(t)
    idx = list(range(order))
    for po in permutations(idx):
        so = perm_sign(po)
        for pv in permutations(idx):
            sv = perm_sign(pv)
            axes = list(po) + [order + q for q in pv]
            out += so * sv * t.transpose(axes)
    return out


# term bases: (name, einsum spec, operand keys)
# operands: fd/wd slices of the T1-DRESSED fock/eris; t2, t3.
R1_TERMS = [
    ('drive',  'ai->ia',              ('f_vo',)),
    ('f_t2',   'me,imae->ia',         ('f_ov', 't2')),
    ('w_t2_v', 'maef,imef->ia',       ('w_ovvv', 't2')),
    ('w_t2_o', 'mnei,mnae->ia',       ('w_oovo', 't2')),
    ('w_t3',   'mnef,imnaef->ia',     ('w_oovv', 't3')),
]

R2_TERMS = [
    ('drive',  'abij->ijab',          ('w_vvoo',)),
    ('f_vv',   'be,ijae->ijab',       ('f_vv', 't2')),
    ('f_oo',   'mj,imab->ijab',       ('f_oo', 't2')),
    ('ladd_v', 'abef,ijef->ijab',     ('w_vvvv', 't2')),
    ('ladd_o', 'mnij,mnab->ijab',     ('w_oooo', 't2')),
    ('ring',   'mbej,imae->ijab',     ('w_ovvo', 't2')),
    ('f_t3',   'me,ijmabe->ijab',     ('f_ov', 't3')),
    ('wv_t3',  'bmef,ijmaef->ijab',   ('w_vovv', 't3')),
    ('wo_t3',  'mnje,imnabe->ijab',   ('w_ooov', 't3')),
    ('q_oo',   'mnef,ijef,mnab->ijab', ('w_oovv', 't2', 't2')),
    ('q_ring', 'mnef,imae,jnbf->ijab', ('w_oovv', 't2', 't2')),
    ('q_fv',   'mnef,mnaf,ijbe->ijab', ('w_oovv', 't2', 't2')),
    ('q_fo',   'mnef,imef,jnab->ijab', ('w_oovv', 't2', 't2')),
]

R3_TERMS = [
    # linear in t2
    ('A1', 'bcei,jkae->ijkabc',        ('w_vvvo', 't2')),
    ('A2', 'majk,imbc->ijkabc',        ('w_ovoo', 't2')),
    # linear in t3
    ('B1', 'ae,ijkebc->ijkabc',        ('f_vv', 't3')),
    ('B2', 'mi,mjkabc->ijkabc',        ('f_oo', 't3')),
    ('B3', 'abef,ijkefc->ijkabc',      ('w_vvvv', 't3')),
    ('B4', 'mnij,mnkabc->ijkabc',      ('w_oooo', 't3')),
    ('B5', 'maei,mjkebc->ijkabc',      ('w_ovvo', 't3')),
    # quadratic t2*t2
    ('Qa', 'maef,imbe,jkcf->ijkabc',   ('w_ovvv', 't2', 't2')),
    ('Qb', 'maef,ijef,kmbc->ijkabc',   ('w_ovvv', 't2', 't2')),
    ('Qc', 'mnie,jmae,knbc->ijkabc',   ('w_ooov', 't2', 't2')),
    ('Qd', 'mnie,mnab,jkce->ijkabc',   ('w_ooov', 't2', 't2')),
    ('Qf', 'me,ijae,kmbc->ijkabc',     ('f_ov', 't2', 't2')),
    # quadratic t2*t3
    ('Qg', 'mnef,mnaf,ijkebc->ijkabc', ('w_oovv', 't2', 't3')),
    ('Qh', 'mnef,imef,njkabc->ijkabc', ('w_oovv', 't2', 't3')),
    ('Qi', 'mnef,ijef,mnkabc->ijkabc', ('w_oovv', 't2', 't3')),
    ('Qj', 'mnef,mnab,ijkefc->ijkabc', ('w_oovv', 't2', 't3')),
    ('Qk', 'mnef,imae,njkfbc->ijkabc', ('w_oovv', 't2', 't3')),
    ('Ql', 'mnef,ijae,mnkfbc->ijkabc', ('w_oovv', 't2', 't3')),
    ('Qm', 'mnef,imab,njkefc->ijkabc', ('w_oovv', 't2', 't3')),
]


def slices(f, w, nocc):
    o = slice(0, nocc)
    v = slice(nocc, None)
    # the CC equations are written for the NORMAL-ORDERED Hamiltonian:
    # f here is the Fock operator f_pq = h_pq + sum_i <pi||qi>
    f = f + np.einsum('piqi->pq', w[:, o, :, o])
    return {
        'f_oo': f[o, o], 'f_ov': f[o, v], 'f_vo': f[v, o], 'f_vv': f[v, v],
        'w_oovv': w[o, o, v, v], 'w_vvoo': w[v, v, o, o],
        'w_ovvv': w[o, v, v, v], 'w_vovv': w[v, o, v, v],
        'w_oovo': w[o, o, v, o], 'w_ooov': w[o, o, o, v],
        'w_vvvv': w[v, v, v, v], 'w_oooo': w[o, o, o, o],
        'w_ovvo': w[o, v, v, o], 'w_vvvo': w[v, v, v, o],
        'w_ovoo': w[o, v, o, o],
    }


def term_values(terms, ops, order):
    cols = []
    for name, spec, keys in terms:
        val = np.einsum(spec, *[ops[k] for k in keys])
        cols.append(antisymmetrize(val, order).ravel())
    return np.stack(cols, axis=1)


def _assemble(terms, order, project, configs):
    """configs: [(nocc, nvir, seed), ...]"""
    A_rows, b_rows = [], []
    for nocc, nvir, seed in configs:
        f, w, _, t2, t3 = fo.random_problem(nocc, nvir, seed=seed)
        ops = dict(slices(f, w, nocc))
        ops['t2'] = t2
        ops['t3'] = t3
        A_rows.append(term_values(terms, ops, order))
        vec = fo.similarity_residual(f, w, nocc, t2=t2, t3=t3)
        b_rows.append(project(vec, nocc + nvir, nocc).ravel())
    return np.concatenate(A_rows, axis=0), np.concatenate(b_rows)


# fit across MULTIPLE sizes: linear dependencies that hold only at small
# nocc/nvir (size coincidences) must not silently zero out needed terms
FIT_CONFIGS = [(4, 4, 0), (5, 3, 1), (3, 5, 2), (5, 4, 3), (4, 5, 4)]
VERIFY_CONFIGS = [(5, 5, 11), (6, 4, 12)]


def fit(terms, order, project):
    from scipy.linalg import qr
    A, b = _assemble(terms, order, project, FIT_CONFIGS)
    # pivoted column selection: unique (rational) coefficients on an
    # independent subset; dropped columns get coefficient 0
    _, R, piv = qr(A, mode='economic', pivoting=True)
    tol = abs(R[0, 0]) * 1e-10
    rank = int(np.sum(np.abs(np.diag(R)) > tol))
    keep = sorted(piv[:rank])
    coef = np.zeros(len(terms))
    sol, _, _, _ = np.linalg.lstsq(A[:, keep], b, rcond=None)
    coef[keep] = sol
    resid = np.abs(A @ coef - b).max()
    # verify on unseen random problems of LARGER sizes
    Av, bv = _assemble(terms, order, project, VERIFY_CONFIGS)
    vresid = np.abs(Av @ coef - bv).max()
    return coef, resid, vresid, rank


def main():
    for label, terms, order, project in [
            ('R1', R1_TERMS, 1, fo.project_singles),
            ('R2', R2_TERMS, 2, fo.project_doubles),
            ('R3', R3_TERMS, 3, fo.project_triples)]:
        coef, resid, vresid, rank = fit(terms, order, project)
        print(f'=== {label}:  max|fit residual| = {resid:.3e}  '
              f'verify(unseen) = {vresid:.3e}  rank {rank}/{len(terms)}')
        for (name, spec, keys), c in zip(terms, coef):
            frac = c * 72  # common denominators: 1/2,1/4,1/6,1/12,1/36...
            print(f'  {name:8s} {spec:28s} coeff = {c:+.10f} '
                  f'(x72 = {frac:+.4f})')


if __name__ == '__main__':
    main()
