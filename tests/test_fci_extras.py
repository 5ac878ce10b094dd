"""FCI extras: spin0, spin ops, fix_spin, transition & 3-particle RDMs.

Reference analog: pyscf/fci/test/test_spin_op.py, test_rdm.py,
test_addons.py. Brute-force oracles use the determinant-level
creation/annihilation operators in fci/ops.py.
"""
import itertools

import numpy as np
import pytest

from pyscf_tpu.fci import (addons, cistring, direct_spin0, direct_spin1,
                           ops, rdm, spin_op)


@pytest.fixture(scope='module')
def h4_like():
    """Random Hermitian (h1e, eri) for norb=4, nelec=(2,2)."""
    np.random.seed(7)
    norb = 4
    h1e = np.random.rand(norb, norb)
    h1e = h1e + h1e.T
    eri = np.random.rand(norb, norb, norb, norb)
    eri = eri + eri.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)
    return h1e, eri, norb


def test_spin0_matches_spin1(h4_like):
    h1e, eri, norb = h4_like
    e1, c1 = direct_spin1.kernel(h1e, eri, norb, (2, 2))
    e0, c0 = direct_spin0.kernel(h1e, eri, norb, (2, 2))
    assert abs(e1 - e0) < 1e-8
    assert abs(np.asarray(c0) - np.asarray(c0).T).max() < 1e-6


def test_spin_square_hf_det():
    na = cistring.num_strings(4, 2)
    ci = np.zeros((na, na))
    ci[0, 0] = 1.0
    ss, mult = spin_op.spin_square(ci, 4, (2, 2))
    assert abs(ss) < 1e-12
    assert abs(mult - 1.0) < 1e-12


def test_spin_square_triplet_det():
    # open-shell ms=1 determinant: S=1
    na = cistring.num_strings(4, 3)
    nb = cistring.num_strings(4, 1)
    ci = np.zeros((na, nb))
    ci[0, 0] = 1.0
    ss, mult = spin_op.spin_square(ci, 4, (3, 1))
    assert abs(ss - 2.0) < 1e-12
    assert abs(mult - 3.0) < 1e-12


def test_fix_spin(h4_like):
    h1e, eri, norb = h4_like
    # ground state of the random H in the ms=0 sector
    e_gs, c_gs = direct_spin1.kernel(h1e, eri, norb, (2, 2))
    ss_gs, _ = spin_op.spin_square(c_gs, norb, (2, 2))
    # penalized solve targeting the ground-state spin reproduces it
    e_fix, c_fix = addons.kernel_fixed_spin(h1e, eri, norb, (2, 2),
                                            ss=round(ss_gs), shift=0.5)
    assert abs(e_fix - e_gs) < 1e-7
    ss_fix, _ = spin_op.spin_square(c_fix, norb, (2, 2))
    assert abs(ss_fix - round(ss_gs)) < 1e-6


def test_rdm123_vs_bruteforce():
    np.random.seed(2)
    norb, nelec = 4, (2, 2)
    na = cistring.num_strings(norb, 2)
    ci = np.random.rand(na, na) - 0.5
    ci /= np.linalg.norm(ci)
    d1, d2, d3 = rdm.make_rdm123(ci, norb, nelec)

    rng = range(norb)
    for p, q, r, s, t, u in itertools.islice(
            itertools.product(rng, repeat=6), 0, None, 37):
        v = 0.0
        for s1 in (0, 1):
            for s2 in (0, 1):
                for s3 in (0, 1):
                    w, _ = ops.apply_op(ci, norb, nelec,
                                        [(p, s1, True), (r, s2, True),
                                         (t, s3, True), (u, s3, False),
                                         (s, s2, False), (q, s1, False)])
                    if w is not None:
                        v += np.sum(ci * w)
        assert abs(d3[p, q, r, s, t, u] - v) < 1e-10


def test_trans_rdm(h4_like):
    h1e, eri, norb = h4_like
    es, cs = direct_spin1.kernel(h1e, eri, norb, (2, 2), nroots=2)
    # diagonal transition rdm = state rdm
    d1 = rdm.trans_rdm1(cs[0], cs[0], norb, (2, 2))
    ref = direct_spin1.make_rdm1(cs[0], norb, (2, 2))
    assert abs(d1 - np.asarray(ref)).max() < 1e-10
    # spin components sum to the total
    da, db = rdm.trans_rdm1s(cs[0], cs[1], norb, (2, 2))
    dt = rdm.trans_rdm1(cs[0], cs[1], norb, (2, 2))
    assert abs(da + db - dt).max() < 1e-10
    # orthogonal states: tr(trans_rdm1) = N <bra|ket> = 0
    assert abs(np.trace(dt)) < 1e-8
    # trans_rdm12 diagonal case matches make_rdm12
    t1, t2 = rdm.trans_rdm12(cs[0], cs[0], norb, (2, 2))
    r1, r2 = direct_spin1.make_rdm12(cs[0], norb, (2, 2))
    assert abs(t2 - np.asarray(r2)).max() < 1e-9


def test_rdm1s_sums(h4_like):
    h1e, eri, norb = h4_like
    e, c = direct_spin1.kernel(h1e, eri, norb, (2, 2))
    da, db = rdm.make_rdm1s(c, norb, (2, 2))
    dt = direct_spin1.make_rdm1(c, norb, (2, 2))
    assert abs(da + db - np.asarray(dt)).max() < 1e-10
    assert abs(np.trace(da) - 2.0) < 1e-10


def test_rdm1234_vs_bruteforce():
    np.random.seed(5)
    norb, nelec = 3, (2, 1)
    na = cistring.num_strings(norb, 2)
    nb = cistring.num_strings(norb, 1)
    ci = np.random.rand(na, nb) - 0.5
    ci /= np.linalg.norm(ci)
    d1, d2, d3, d4 = rdm.make_rdm1234(ci, norb, nelec)
    for idx in itertools.islice(itertools.product(range(norb), repeat=8),
                                0, None, 131):
        p, q, r, s, t, u, v, w = idx
        val = 0.0
        for s1 in (0, 1):
            for s2 in (0, 1):
                for s3 in (0, 1):
                    for s4 in (0, 1):
                        x, _ = ops.apply_op(
                            ci, norb, nelec,
                            [(p, s1, True), (r, s2, True), (t, s3, True),
                             (v, s4, True), (w, s4, False), (u, s3, False),
                             (s, s2, False), (q, s1, False)])
                        if x is not None:
                            val += np.sum(ci * x)
        assert abs(d4[idx] - val) < 1e-10
    # partial trace: sum_w dm4[...,w,w] = (N-3) dm3  (N=3 -> zero)
    pt4 = np.einsum('pqrstuww->pqrstu', d4)
    assert abs(pt4 - 0.0 * d3).max() < 1e-10
