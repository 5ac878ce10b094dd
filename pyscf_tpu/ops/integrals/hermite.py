"""McMurchie-Davidson Hermite expansion machinery, batched/static-shape.

Gaussian-product expansions E_t^{ij} and Hermite Coulomb integrals R_{tuv}.
These replace libcint's Rys-quadrature C recursion (reference:
pyscf/lib + external libcint, driven by pyscf/gto/moleintor.py:41) with
regular vectorized recursions traced once per angular-momentum class —
all batch dims map onto the TPU VPU, the final cart/Hermite contractions
onto the MXU.

Conventions:
  E_t^{i,j}: expansion of G_i(x; a, A) G_j(x; b, B) (monomial prefactors
  x_A^i x_B^j, *without* the Gaussian-product prefactor exp(-mu*AB^2) —
  it is included in E_0^{0,0}).

  R_{tuv}(p, PQ): (∂/∂P)^tuv applied to F0, i.e.
  R_{tuv} = (-1)^... standard MD R integrals with R_000^{(n)} = (-2p)^n F_n(T).
"""
from functools import lru_cache

import jax.numpy as jnp

from .boys import boys


def n_cart(l):
    return (l + 1) * (l + 2) // 2


def n_tuv(L):
    return (L + 1) * (L + 2) * (L + 3) // 6


@lru_cache(maxsize=None)
def cart_components(l):
    """Cartesian monomial exponent triples for angular momentum l.

    Order: lexicographic with x-power decreasing (matches common CCA order:
    l=1 -> x,y,z; l=2 -> xx,xy,xz,yy,yz,zz).
    """
    out = []
    for ix in range(l, -1, -1):
        for iy in range(l - ix, -1, -1):
            out.append((ix, iy, l - ix - iy))
    return tuple(out)


@lru_cache(maxsize=None)
def tuv_components(L):
    """Hermite (t,u,v) triples with t+u+v <= L, ordered by total order."""
    out = []
    for n in range(L + 1):
        for t in range(n, -1, -1):
            for u in range(n - t, -1, -1):
                out.append((t, u, n - t - u))
    return tuple(out)


@lru_cache(maxsize=None)
def tuv_index(L):
    return {c: i for i, c in enumerate(tuv_components(L))}


def e1d(la, lb, a, b, ab):
    """1D Hermite expansion coefficients E_t^{i,j} for i<=la, j<=lb.

    a, b: exponent arrays (batch shape S). ab: A_x - B_x (batch shape S).
    Returns dict {(i, j, t): array of shape S}. E[0,0,0] includes the
    Gaussian-product prefactor exp(-mu*ab^2).
    """
    p = a + b
    mu = a * b / p
    inv2p = 0.5 / p
    qa = -b / p * ab   # (P - A)_x
    qb = a / p * ab    # (P - B)_x
    E = {(0, 0, 0): jnp.exp(-mu * ab * ab)}
    zero = jnp.zeros_like(p)

    def get(i, j, t):
        if t < 0 or t > i + j or i < 0 or j < 0:
            return zero
        return E[(i, j, t)]

    for i in range(la + 1):
        for j in range(lb + 1):
            if i == 0 and j == 0:
                continue
            for t in range(i + j + 1):
                if j == 0:
                    # increment i
                    E[(i, j, t)] = (inv2p * get(i - 1, j, t - 1)
                                    + qa * get(i - 1, j, t)
                                    + (t + 1) * get(i - 1, j, t + 1))
                else:
                    E[(i, j, t)] = (inv2p * get(i, j - 1, t - 1)
                                    + qb * get(i, j - 1, t)
                                    + (t + 1) * get(i, j - 1, t + 1))
    return E


def e1d_dense(la, lb, a, b, ab):
    """Dense 1D E table: array (..., la+1, lb+1, la+lb+1).

    Entries with t > i+j are zero. Batch-last layout keeps the recursion
    vectorized; only (la+1)(lb+1)(L+1) stack ops are traced.
    """
    E = e1d(la, lb, a, b, ab)
    L = la + lb
    zero = jnp.zeros(jnp.broadcast_shapes(a.shape, b.shape, ab.shape),
                     dtype=ab.dtype)
    rows = []
    for i in range(la + 1):
        for j in range(lb + 1):
            for t in range(L + 1):
                v = E.get((i, j, t), None)
                rows.append(zero if (v is None or t > i + j)
                            else jnp.broadcast_to(v, zero.shape))
    out = jnp.stack(rows, axis=-1)
    return out.reshape(out.shape[:-1] + (la + 1, lb + 1, L + 1))


@lru_cache(maxsize=None)
def _e3d_gather_indices(la, lb):
    """Index arrays mapping (cart_a, cart_b, tuv) -> 1D table entries."""
    import numpy as np
    carts_a = cart_components(la)
    carts_b = cart_components(lb)
    tuvs = tuv_components(la + lb)
    nca, ncb, nt = len(carts_a), len(carts_b), len(tuvs)
    ia = np.zeros((nca, ncb, nt, 3), dtype=np.int32)
    jb = np.zeros((nca, ncb, nt, 3), dtype=np.int32)
    tt = np.zeros((nca, ncb, nt, 3), dtype=np.int32)
    for i, ca in enumerate(carts_a):
        for j, cb in enumerate(carts_b):
            for k, tuv in enumerate(tuvs):
                for d in range(3):
                    ia[i, j, k, d] = ca[d]
                    jb[i, j, k, d] = cb[d]
                    tt[i, j, k, d] = tuv[d]
    return ia, jb, tt


def e3d(la, lb, exps_a, exps_b, ra, rb):
    """Full 3D Hermite expansion tensor for a batch of primitive pairs.

    exps_a/exps_b: (...,) exponents; ra/rb: (..., 3) centers.
    Returns array of shape (..., ncart(la), ncart(lb), ntuv(la+lb)).
    """
    Ed = [e1d_dense(la, lb, exps_a, exps_b, ra[..., d] - rb[..., d])
          for d in range(3)]
    ia, jb, tt = _e3d_gather_indices(la, lb)
    out = (Ed[0][..., ia[..., 0], jb[..., 0], tt[..., 0]]
           * Ed[1][..., ia[..., 1], jb[..., 1], tt[..., 1]]
           * Ed[2][..., ia[..., 2], jb[..., 2], tt[..., 2]])
    return out


@lru_cache(maxsize=None)
def _r_step_tables(L, n):
    """Gather tables for one downward-n step of the R recursion.

    For each entry tuv of T_n (orders <= L-n), with d = first nonzero
    direction:  T_n[tuv] = (c_d-1) T_{n+1}[tuv-2e_d] + X_d T_{n+1}[tuv-e_d].
    Returns (idx2, coef, idx1, dsel): T_n = coef*T[idx2] + X[dsel]*T[idx1],
    entry 0 overwritten with (-2p)^n F_n afterwards. Two gathers + one
    fused multiply-add per step -> O(L) graph nodes and O(batch*ntuv)
    flops (the recursion has only 2 terms per entry; a dense-matrix form
    wastes ~ntuv/2 x the work)."""
    import numpy as np
    prev = tuv_components(L - n - 1)
    nxt = tuv_components(L - n)
    iprev = {c: i for i, c in enumerate(prev)}
    m = len(nxt)
    idx1 = np.zeros(m, dtype=np.int32)
    idx2 = np.zeros(m, dtype=np.int32)
    coef = np.zeros(m)
    dsel = np.zeros(m, dtype=np.int32)
    for j, c in enumerate(nxt):
        if c == (0, 0, 0):
            continue
        d = 0 if c[0] > 0 else (1 if c[1] > 0 else 2)
        dsel[j] = d
        e1 = list(c)
        e1[d] -= 1
        idx1[j] = iprev[tuple(e1)]
        if c[d] >= 2:
            e2 = list(c)
            e2[d] -= 2
            idx2[j] = iprev[tuple(e2)]
            coef[j] = c[d] - 1
    return idx2, coef, idx1, dsel


def hermite_R(L, p, rpq):
    """Hermite Coulomb integral table R_{tuv}(p, PQ) for t+u+v <= L.

    p: (...,) combined exponent (or reduced exponent omega for ERI).
    rpq: (..., 3) P - Q vector.
    Returns (..., ntuv(L)).
    """
    t2 = p * jnp.sum(rpq * rpq, axis=-1)
    F = boys(L, t2)                      # (L+1, ...)
    m2p = -2.0 * p

    pw = jnp.ones_like(p)
    pows = []                            # (-2p)^n for n = 0..L
    for n in range(L + 1):
        pows.append(pw)
        if n < L:
            pw = pw * m2p
    T = (pows[L] * F[L])[..., None]      # T_L: single entry R^{(L)}_000
    for n in range(L - 1, -1, -1):
        idx2, coef, idx1, dsel = _r_step_tables(L, n)
        Xd = jnp.take(rpq, jnp.asarray(dsel), axis=-1)   # (..., nt_next)
        Tn = jnp.asarray(coef) * T[..., jnp.asarray(idx2)] \
            + Xd * T[..., jnp.asarray(idx1)]
        T = Tn.at[..., 0].set(pows[n] * F[n])
    return T
