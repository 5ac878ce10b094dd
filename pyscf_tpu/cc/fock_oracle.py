"""Exact Fock-space oracle for coupled-cluster residual equations.

Represents second-quantized operators by their action on state vectors in
the 2^n-dimensional Fock space of n spin-orbitals (Jordan-Wigner signs),
so that

    R_mu = <Phi_mu| e^{-T} H e^{T} |0>

can be evaluated EXACTLY for arbitrary (random, non-hermitian) one- and
two-electron tensors and arbitrary cluster amplitudes.  Any projected CC
working equation (CCSD/CCSDT/CCSDTQ residuals, lambda, EOM matvecs) can
be validated against it term by term on random inputs — sign and factor
errors cannot survive.  Used by the test suite to certify the einsum
implementations (tests/test_ccsdt.py); exponential cost, tiny n only.

This replaces the reference's practice of validating fast kernels
against hand-written ``_slow`` modules (SURVEY §4): here the slow
reference is generated from second quantization itself.
"""
import numpy as np


def _apply_string(ops, v, nocc_total_bits):
    """Apply a product of elementary operators (rightmost first).

    ops: list of (orb, is_creation). Returns the new vector."""
    dim = v.shape[0]
    idx = np.arange(dim)
    amp = v.copy()
    state = idx.copy()
    alive = np.ones(dim, dtype=bool)
    for orb, is_cre in reversed(ops):
        bit = 1 << orb
        occ = (state & bit) != 0
        ok = (~occ) if is_cre else occ
        alive &= ok
        lower = state & (bit - 1)
        # parity of the bits below orb
        par = lower.copy()
        for shift in (1, 2, 4, 8, 16):
            par ^= par >> shift
        sign = 1.0 - 2.0 * (par & 1)
        amp = np.where(alive, amp * sign, 0.0)
        state = np.where(alive, state ^ bit, state)
    out = np.zeros_like(v)
    np.add.at(out, state[alive], amp[alive])
    return out


def apply_hamiltonian(f, w, v):
    """(sum f_pq p+ q + 1/4 sum w_pqrs p+ q+ s r) v, physicists' <pq||rs>
    antisymmetrized w; f, w may be non-hermitian."""
    n = f.shape[0]
    out = np.zeros_like(v)
    for p in range(n):
        for q in range(n):
            if f[p, q] != 0.0:
                out += f[p, q] * _apply_string(
                    [(p, True), (q, False)], v, n)
    for p in range(n):
        for q in range(p + 1, n):           # antisymmetry: p<q, r<s, x4
            for r in range(n):
                for s in range(r + 1, n):
                    c = w[p, q, r, s]
                    if c != 0.0:
                        out += c * _apply_string(
                            [(p, True), (q, True), (s, False), (r, False)],
                            v, n)
    return out


def apply_cluster(nocc, v, t1=None, t2=None, t3=None, t4=None):
    """(T1 + T2 + T3 + T4) v, antisymmetric amplitudes t_ij..^ab.."""
    out = np.zeros_like(v)
    if t1 is not None:
        no, nv = t1.shape
        for i in range(no):
            for a in range(nv):
                if t1[i, a] != 0.0:
                    out += t1[i, a] * _apply_string(
                        [(nocc + a, True), (i, False)], v, nocc + nv)
    if t2 is not None:
        no, _, nv, _ = t2.shape
        for i in range(no):
            for j in range(i + 1, no):
                for a in range(nv):
                    for b in range(a + 1, nv):
                        c = t2[i, j, a, b]
                        if c != 0.0:
                            out += c * _apply_string(
                                [(nocc + a, True), (nocc + b, True),
                                 (j, False), (i, False)], v, nocc + nv)
    if t3 is not None:
        no = t3.shape[0]
        nv = t3.shape[3]
        for i in range(no):
            for j in range(i + 1, no):
                for k in range(j + 1, no):
                    for a in range(nv):
                        for b in range(a + 1, nv):
                            for c in range(b + 1, nv):
                                amp = t3[i, j, k, a, b, c]
                                if amp != 0.0:
                                    out += amp * _apply_string(
                                        [(nocc + a, True), (nocc + b, True),
                                         (nocc + c, True), (k, False),
                                         (j, False), (i, False)],
                                        v, nocc + nv)
    if t4 is not None:
        no = t4.shape[0]
        nv = t4.shape[4]
        for i in range(no):
            for j in range(i + 1, no):
                for k in range(j + 1, no):
                    for l in range(k + 1, no):
                        for a in range(nv):
                            for b in range(a + 1, nv):
                                for c in range(b + 1, nv):
                                    for d in range(c + 1, nv):
                                        amp = t4[i, j, k, l, a, b, c, d]
                                        if amp != 0.0:
                                            out += amp * _apply_string(
                                                [(nocc + a, True),
                                                 (nocc + b, True),
                                                 (nocc + c, True),
                                                 (nocc + d, True),
                                                 (l, False), (k, False),
                                                 (j, False), (i, False)],
                                                v, nocc + nv)
    return out


def hf_vector(n, nocc):
    v = np.zeros(2 ** n)
    v[(1 << nocc) - 1] = 1.0
    return v


def _expm_apply(apply_t, v, sign=1.0):
    """e^{sign*T} v via the terminating Taylor series."""
    out = v.copy()
    term = v.copy()
    for k in range(1, 60):
        term = sign * apply_t(term) / k
        out = out + term
        if np.abs(term).max() < 1e-15:
            break
    return out


def similarity_residual(f, w, nocc, t1=None, t2=None, t3=None, t4=None):
    """e^{-T} H e^{T} |0> as a Fock-space vector."""
    n = f.shape[0]

    def T(x):
        return apply_cluster(nocc, x, t1, t2, t3, t4)

    v = hf_vector(n, nocc)
    v = _expm_apply(T, v)
    v = apply_hamiltonian(f, w, v)
    return _expm_apply(T, v, sign=-1.0)


def _project(vec, n, nocc, order):
    """R[i..,a..] = <Phi_{i..}^{a..}| vec> for |Phi> = a+ b+ .. j i |0>."""
    from itertools import permutations, combinations
    nv = n - nocc
    hf = hf_vector(n, nocc)
    shape = (nocc,) * order + (nv,) * order
    r = np.zeros(shape)
    for occs in combinations(range(nocc), order):
        for virs in combinations(range(nv), order):
            ops = ([(nocc + a, True) for a in virs]
                   + [(i, False) for i in reversed(occs)])
            bra = _apply_string(ops, hf, n)
            val = bra @ vec
            if val == 0.0:
                continue
            # fill all index permutations with antisymmetric signs
            for po, so in _signed_perms(occs):
                for pv, sv in _signed_perms(virs):
                    r[tuple(po) + tuple(pv)] = so * sv * val
    return r


def _signed_perms(tup):
    from itertools import permutations
    base = list(tup)
    out = []
    for p in permutations(range(len(base))):
        sign = 1
        seen = list(p)
        # parity via inversion count
        inv = sum(1 for x in range(len(p)) for y in range(x + 1, len(p))
                  if p[x] > p[y])
        out.append(([base[q] for q in p], (-1.0) ** inv))
    return out


def project_singles(vec, n, nocc):
    return _project(vec, n, nocc, 1)


def project_doubles(vec, n, nocc):
    return _project(vec, n, nocc, 2)


def project_triples(vec, n, nocc):
    return _project(vec, n, nocc, 3)


def project_quadruples(vec, n, nocc):
    return _project(vec, n, nocc, 4)


def _antisymmetrize(t, order):
    """Full antisymmetrization over the occ block and the vir block."""
    from itertools import permutations
    out = np.zeros_like(t)
    idx = list(range(order))
    for po in permutations(idx):
        so = _perm_sign(po)
        for pv in permutations(idx):
            sv = _perm_sign(pv)
            axes = list(po) + [order + q for q in pv]
            out += so * sv * t.transpose(axes)
    return out / 1.0


def _perm_sign(p):
    inv = sum(1 for x in range(len(p)) for y in range(x + 1, len(p))
              if p[x] > p[y])
    return (-1.0) ** inv


def random_problem(nocc, nvir, seed=0, with_t1=False):
    """Random antisymmetrized (f, w, t1, t2, t3) for oracle tests."""
    rng = np.random.RandomState(seed)
    n = nocc + nvir

    f = rng.uniform(-1, 1, (n, n))
    w = rng.uniform(-1, 1, (n,) * 4)
    w = w - w.transpose(1, 0, 2, 3)
    w = 0.5 * (w - w.transpose(0, 1, 3, 2))

    t1 = rng.uniform(-1, 1, (nocc, nvir)) if with_t1 else None

    t2 = rng.uniform(-1, 1, (nocc, nocc, nvir, nvir))
    t2 = _antisymmetrize(t2.reshape(nocc, nocc, nvir, nvir), 2) / 4.0

    t3 = rng.uniform(-1, 1, (nocc,) * 3 + (nvir,) * 3)
    t3 = _antisymmetrize(t3, 3) / 36.0
    return f, w, t1, t2, t3
