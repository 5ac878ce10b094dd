"""Device-resident DF-factor engine (v2): screened, sph-folded, few-program.

Replaces the host-assembled `int2e.int3c2e` pipeline for the density-fitting
factorization (reference analog: libcint int3c2e driven by
pyscf/df/incore.py:40 cholesky_eri + pyscf/df/outcore.py:109).

Design notes (TPU-first):
  * The spherical transform is FOLDED INTO the Hermite E tables: the MD
    expansion (ab| = E[m, cart_ab, tuv] * R is linear in the cart axis, so
    E_sph = (Sa (x) Sb) E_cart is computed where E is built. Every
    downstream intermediate shrinks by the cart->sph ratio (2x for f,f).
  * (ij|P) == (ji|P): the row table stores each shell pair once and the
    final gather maps both AO orderings to the same row - no mirror copy.
  * PROGRAM-COUNT DISCIPLINE: XLA compiles cost seconds per program on
    both this host's 1-core CPU backend and the remote TPU AOT service,
    and round-4's per-(class x aux-class) kernels (60+ programs) were the
    1700 s cold-start. Here one jitted program per BRA class loops over
    aux classes inside the trace, plus one aux-prep, one j2c+whitener and
    one assemble program: ~13 compiles for a cc-pVTZ system.
  * Whitening (B = L^{-1} (P|ij)) happens inside the class scan as one
    MXU matmul per chunk, so the raw 3c table is never materialized.
  * All tables are generated ON DEVICE from O(nshell) metadata - the TPU
    tunnel moves ~25 MB/s host->device, so shipping assembled tensors is
    minutes while shell tables are milliseconds.
  * Chunk sizes come from an element BUDGET (~0.25 GB f64 per
    intermediate): larger f64 temporaries break the TPU AOT compile
    (observed at ~1.8 GB) and would blow HBM at 580+ AO.

Peak device memory ~= V rows (half of B) + B itself + BUDGET temporaries.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .cart2sph import cart2sph
from .hermite import e3d, n_tuv, hermite_R
from .int2e import _comb_onehot3, pair_screen_bound, SCREEN_THRESH

# per-intermediate element budget (f64): 3e7 elems ~= 240 MB
BUDGET_ELEMS = int(3.0e7)
_ROW_QUANT = 256


def _sph(l):
    return jnp.asarray(cart2sph(l))


# ---------------------------------------------------------------------------
# host-side metadata
# ---------------------------------------------------------------------------

class _BraClass:
    """Screened shell-pair metadata for one (la, lb) class (host only)."""

    def __init__(self, mol, la, lb, thresh=SCREEN_THRESH):
        ga, gb = mol.shell_groups[la], mol.shell_groups[lb]
        self.la, self.lb = la, lb
        self.ga, self.gb = ga, gb
        bound = pair_screen_bound(ga, gb)
        if la == lb:
            bound = np.triu(bound)
        sel = np.argwhere(bound > thresh)
        self.nsel = sel.shape[0]
        self.sel_a = sel[:, 0]
        self.sel_b = sel[:, 1]
        self.Ka, self.Kb = ga.nprim, gb.nprim
        self.KK = self.Ka * self.Kb
        self.da, self.db = 2 * la + 1, 2 * lb + 1
        self.ns1 = self.da * self.db
        self.nt1 = n_tuv(la + lb)

    def chunk_arrays(self, npc):
        """Zero-padded (nchunk, npc, K)/(nchunk, npc, 3) numpy inputs."""
        nsel = self.nsel
        nchunk = max(1, -(-nsel // npc))
        nchunk = 1 << (nchunk - 1).bit_length()     # compile-key bucketing
        npad = nchunk * npc
        ea = np.ones((npad, self.Ka)); ca = np.zeros((npad, self.Ka))
        ra = np.zeros((npad, 3))
        eb = np.ones((npad, self.Kb)); cb = np.zeros((npad, self.Kb))
        rb = np.zeros((npad, 3))
        ea[:nsel] = self.ga.exps[self.sel_a]
        ca[:nsel] = self.ga.coeffs[self.sel_a]
        ra[:nsel] = self.ga.coords[self.sel_a]
        eb[:nsel] = self.gb.exps[self.sel_b]
        cb[:nsel] = self.gb.coeffs[self.sel_b]
        rb[:nsel] = self.gb.coords[self.sel_b]
        rs = lambda x: x.reshape((nchunk, npc) + x.shape[1:])
        return tuple(map(rs, (ea, ca, ra, eb, cb, rb))), nchunk


def _bra_classes(mol):
    cache = getattr(mol, '_j3c_cache', None)
    if cache is None:
        cache = mol._j3c_cache = {}
    if 'bra' not in cache:
        ls = sorted(mol.shell_groups.keys())
        cache['bra'] = {(la, lb): _BraClass(mol, la, lb)
                        for la in ls for lb in ls if lb >= la}
    return cache['bra']


def _aux_meta(auxmol):
    """Static per-l aux signature + raw numpy shell tables."""
    cache = getattr(auxmol, '_j3c_cache', None)
    if cache is None:
        cache = auxmol._j3c_cache = {}
    if 'auxmeta' not in cache:
        meta, raw = [], []
        for l in sorted(auxmol.shell_groups.keys()):
            g = auxmol.shell_groups[l]
            meta.append((l, g.nprim, g.nshl))
            raw.append((g.exps, g.coeffs, g.coords))
        cache['auxmeta'] = (tuple(meta), raw)
    return cache['auxmeta']


# ---------------------------------------------------------------------------
# device programs
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0,))
def _aux_prep(meta, raw):
    """Sph-folded Hermite tables for every aux class, one program.

    Returns tuple of (p (nsx*K,), P (nsx*K, 3), E (nsx*K, 2l+1, ntuv))."""
    out = []
    for (l, K, nsx), (e, c, r) in zip(meta, raw):
        ef = e.reshape(-1)
        cf = c.reshape(-1)
        rf = jnp.repeat(r, K, axis=0)
        E = e3d(l, 0, ef, jnp.zeros_like(ef), rf, rf)[:, :, 0, :]
        E = E * cf[:, None, None]
        E = jnp.einsum('mpt,ap->mat', E, _sph(l))
        out.append((ef, rf, E))
    return tuple(out)


def _pair_sph_tables(la, lb, ea, ca, ra, eb, cb, rb):
    """Traced: sph-folded pair tables for (npc, K*) chunk arrays."""
    npc, Ka = ea.shape
    Kb = eb.shape[1]
    m = npc * Ka * Kb
    a = jnp.broadcast_to(ea[:, :, None], (npc, Ka, Kb)).reshape(m)
    b = jnp.broadcast_to(eb[:, None, :], (npc, Ka, Kb)).reshape(m)
    A = jnp.broadcast_to(ra[:, None, None, :], (npc, Ka, Kb, 3)).reshape(m, 3)
    B = jnp.broadcast_to(rb[:, None, None, :], (npc, Ka, Kb, 3)).reshape(m, 3)
    w = (ca[:, :, None] * cb[:, None, :]).reshape(m)
    p = a + b
    P = (a[:, None] * A + b[:, None] * B) / p[:, None]
    E = e3d(la, lb, a, b, A, B) * w[:, None, None, None]
    Sa, Sb = _sph(la), _sph(lb)
    E = jnp.einsum('mpqt,ap,bq->mabt', E, Sa, Sb)
    return p, P, E.reshape(m, Sa.shape[0] * Sb.shape[0], E.shape[-1])


def _pick_chunks(KK1, ns1, nt1, K2, ns2, L, mX, nsel):
    """(npair_chunk, aux_shl_tile) bounding intermediates to BUDGET."""
    ntL = n_tuv(L)
    per_rowpair = max(ntL, ns2 * nt1, ns1 * ns2)
    prod = max(4096, BUDGET_ELEMS // per_rowpair)     # C1 * C2 budget
    C2 = min(mX, 4096, max(1, prod // 256))
    nshl_tile = max(1, C2 // K2)
    C2 = nshl_tile * K2
    C1 = max(KK1, min(prod // C2, 8192))
    npair_chunk = max(1, C1 // KK1)
    if npair_chunk > nsel:
        npair_chunk = 1 << (nsel - 1).bit_length() if nsel > 1 else 1
    else:
        q = max(1, _ROW_QUANT // KK1)
        npair_chunk = q * max(1, npair_chunk // q)
    return npair_chunk, nshl_tile


def _class_tiles(bc, aux_meta):
    """(npc, per-aux-class shell tiles) for one bra class (static)."""
    L1 = bc.la + bc.lb
    picks = [
        _pick_chunks(bc.KK, bc.ns1, bc.nt1, K2, 2 * l2 + 1,
                     L1 + l2, max(1, nsx * K2), bc.nsel)
        for (l2, K2, nsx) in aux_meta]
    npc = min(p[0] for p in picks)      # one bra chunking for all aux
    return npc, tuple(p[1] for p in picks)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 12))
def _class_program(la, lb, aux_meta, tiles,
                   ea, ca, ra, eb, cb, rb, aux_data, linv_t,
                   rs_omega=None):
    """Whitened DF rows for one bra class: ONE compiled program.

    ea.. (nchunk, npc, K*) padded chunk inputs; aux_data from _aux_prep;
    linv_t (naux, naux) = (L^{-1})^T in grouped aux order.
    Returns (nchunk*npc*da*db, naux) rows of B (pair-major, a-major).
    """
    KK1 = ea.shape[2] * eb.shape[2]
    npc = ea.shape[1]
    da, db = 2 * la + 1, 2 * lb + 1
    ns1 = da * db
    naux = linv_t.shape[0]

    def bra_chunk(carry, ch):
        ea_c, ca_c, ra_c, eb_c, cb_c, rb_c = ch
        p1, P1, E1 = _pair_sph_tables(la, lb, ea_c, ca_c, ra_c,
                                      eb_c, cb_c, rb_c)
        C1 = p1.shape[0]
        nt1 = E1.shape[-1]
        cols = []
        for (l2, K2, nsx), nshl_tile, (p2, P2, E2) in zip(
                aux_meta, tiles, aux_data):
            ns2 = 2 * l2 + 1
            L = la + lb + l2
            ntL = n_tuv(L)
            W3 = jnp.asarray(_comb_onehot3(la + lb, l2))
            AUXT = nshl_tile * K2
            mX = p2.shape[0]
            ntiles = -(-mX // AUXT)
            pad = ntiles * AUXT - mX
            p2p = jnp.pad(p2, (0, pad), constant_values=1.0)
            P2p = jnp.pad(P2, ((0, pad), (0, 0)))
            E2p = jnp.pad(E2, ((0, pad), (0, 0), (0, 0)))
            xs = (p2p.reshape(ntiles, AUXT), P2p.reshape(ntiles, AUXT, 3),
                  E2p.reshape(ntiles, AUXT, ns2, E2.shape[-1]))

            def aux_tile(carry2, ch2, E1=E1, p1=p1, P1=P1, L=L, ntL=ntL,
                         W3=W3, K2=K2, ns2=ns2, nt1=nt1, AUXT=AUXT,
                         nshl_tile=nshl_tile, C1=C1):
                p2t, P2t, E2t = ch2
                pp = p1[:, None] * p2t[None, :]
                ps = p1[:, None] + p2t[None, :]
                omega = pp / ps
                pref = 2.0 * jnp.pi ** 2.5 / (pp * jnp.sqrt(ps))
                if rs_omega is not None:
                    theta = rs_omega ** 2 / (rs_omega ** 2 + omega)
                    omega = omega * theta
                    pref = pref * jnp.sqrt(theta)
                rpq = P1[:, None, :] - P2t[None, :, :]
                R = hermite_R(L, omega, rpq) * pref[..., None]
                P2f = jnp.einsum('bqt,stL->bqsL', E2t, W3)
                Q = jax.lax.dot_general(
                    R, P2f.reshape(AUXT, ns2 * nt1, ntL),
                    dimension_numbers=(((2,), (2,)), ((1,), (0,))),
                    preferred_element_type=R.dtype)     # (AUXT, C1, q*s)
                Q = Q.reshape(nshl_tile, K2, C1, ns2, nt1).sum(axis=1)
                Q = Q.reshape(nshl_tile, npc, KK1, ns2, nt1)
                out = jnp.einsum('akps,xakqs->apxq',
                                 E1.reshape(npc, KK1, ns1, nt1), Q)
                return carry2, out          # (npc, ns1, nshl_tile, ns2)

            _, ys = jax.lax.scan(aux_tile, 0, xs)
            ys = jnp.moveaxis(ys, 0, 2).reshape(
                npc, ns1, ntiles * nshl_tile, ns2)
            cols.append(ys[:, :, :nsx, :].reshape(npc, ns1, nsx * ns2))
        rows = jnp.concatenate(cols, axis=-1).reshape(npc * ns1, naux)
        rowsB = jax.lax.dot_general(
            rows, linv_t, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=rows.dtype)
        return carry, rowsB

    _, ys = jax.lax.scan(bra_chunk, 0, (ea, ca, ra, eb, cb, rb))
    return ys.reshape(-1, naux)


def _eri_2c_sph(lx, ly, px, Px, Ex, py, Py, Ey, rs_omega=None):
    """(P|Q) block between two sph-folded aux tables (traced)."""
    L = lx + ly
    ntL = n_tuv(L)
    pp = px[:, None] * py[None, :]
    ps = px[:, None] + py[None, :]
    omega = pp / ps
    pref = 2.0 * jnp.pi ** 2.5 / (pp * jnp.sqrt(ps))
    if rs_omega is not None:
        theta = rs_omega ** 2 / (rs_omega ** 2 + omega)
        omega = omega * theta
        pref = pref * jnp.sqrt(theta)
    rpq = Px[:, None, :] - Py[None, :, :]
    R = hermite_R(L, omega, rpq) * pref[..., None]     # (mx, my, ntL)
    W3 = jnp.asarray(_comb_onehot3(lx, ly))            # (ntx, nty, ntL)
    Pf = jnp.einsum('bqt,stL->bqsL', Ey, W3)           # (my, nsy, ntx, ntL)
    my, nsy = Ey.shape[0], Ey.shape[1]
    ntx = Ex.shape[-1]
    Q = jax.lax.dot_general(
        R, Pf.reshape(my, nsy * ntx, ntL),
        dimension_numbers=(((2,), (2,)), ((1,), (0,))),
        preferred_element_type=R.dtype)                # (my, mx, nsy*ntx)
    Q = Q.reshape(my, Ex.shape[0], nsy, ntx)
    return jnp.einsum('aps,baqs->apbq', Ex, Q)         # (mx, nsx, my, nsy)


@partial(jax.jit, static_argnums=(0,))
def _j2c_whitener(meta, aux_data, rs_omega=None):
    """Grouped-order (P|Q), its Cholesky whitener (L^{-1})^T: one program."""
    rows = []
    for (lx, Kx, nsx), (px, Px, Ex) in zip(meta, aux_data):
        cols = []
        for (ly, Ky, nsy), (py, Py, Ey) in zip(meta, aux_data):
            blk = _eri_2c_sph(lx, ly, px, Px, Ex, py, Py, Ey,
                              rs_omega=rs_omega)
            dx, dy = 2 * lx + 1, 2 * ly + 1
            blk = blk.reshape(nsx, Kx, dx, nsy, Ky, dy).sum(axis=(1, 4))
            cols.append(blk.reshape(nsx * dx, nsy * dy))
        rows.append(jnp.concatenate(cols, axis=1))
    jg = jnp.concatenate(rows, axis=0)
    L = jnp.linalg.cholesky(jg)
    linv_t = jax.scipy.linalg.solve_triangular(
        L, jnp.eye(jg.shape[0], dtype=jg.dtype), lower=True).T
    return jg, linv_t


@jax.jit
def _assemble(pieces, row_map, col_order):
    """Concat class pieces, gather to dense (naux, nao, nao) AO order."""
    naux = pieces[0].shape[1]
    V = jnp.concatenate(list(pieces) + [jnp.zeros((1, naux),
                                                  pieces[0].dtype)], axis=0)
    B = jnp.take(V, row_map, axis=0)                   # (nao*nao, naux)
    nao2 = row_map.shape[0]
    nao = int(np.sqrt(nao2))
    B = B.T.reshape(naux, nao, nao)
    return jnp.take(B, col_order, axis=0)              # AO aux order


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _grouped_order(auxmol, meta):
    """grouped column position -> AO aux index, and its inverse."""
    order = []
    for (l, K, nsx) in meta:
        g = auxmol.shell_groups[l]
        xz = g.ao_off[:, None] + np.arange(2 * l + 1)
        order.append(xz.reshape(-1))
    order = np.concatenate(order)
    inv = np.empty_like(order)
    inv[order] = np.arange(order.size)
    return order, inv


def df_factor(mol, auxmol, omega=None):
    """Dense whitened DF factor B (naux, nao, nao), built on device.

    (ij|kl) ~= sum_P B[P,i,j] B[P,k,l]. Runs as ~(n_bra_classes + 3)
    compiled programs; peak device memory ~= 1.5x B + bounded temporaries.

    Unlike the legacy host-assembled integral paths, this engine runs on
    the DEFAULT backend by design: generation, whitening and consumption
    all stay in accelerator memory (the TPU tunnel moves ~25 MB/s, so a
    host-built B tensor would take minutes to ship; the 1-core host CPU
    took 1122 s to build a 580-AO factor in round 4).
    """
    nao, naux = mol.nao, auxmol.nao
    bra = _bra_classes(mol)
    meta, raw = _aux_meta(auxmol)
    aux_data = _aux_prep(meta, tuple(
        (jnp.asarray(e), jnp.asarray(c), jnp.asarray(r))
        for (e, c, r) in raw))
    _, linv_t = _j2c_whitener(meta, aux_data, rs_omega=omega)
    pieces = []
    row_ids = []        # (host) flat AO row ids per piece row
    for (la, lb), bc in bra.items():
        if bc.nsel == 0:
            continue
        npc, tiles = _class_tiles(bc, meta)
        (ea, ca, ra, eb, cb, rb), nchunk = bc.chunk_arrays(npc)
        ys = _class_program(
            la, lb, meta, tiles,
            jnp.asarray(ea), jnp.asarray(ca), jnp.asarray(ra),
            jnp.asarray(eb), jnp.asarray(cb), jnp.asarray(rb),
            aux_data, linv_t, rs_omega=omega)
        pieces.append(ys)
        row_ids.append(_row_maps(mol, bc, nchunk * npc))
    nrows = sum(p.shape[0] for p in pieces)
    row_map = np.full(nao * nao, nrows, dtype=np.int64)
    off = 0
    for (rows_ij, rows_ji, rowpos), piece in zip(row_ids, pieces):
        row_map[rows_ij] = off + rowpos
        row_map[rows_ji] = off + rowpos       # (ij|P) == (ji|P)
        off += piece.shape[0]
    order, _ = _grouped_order(auxmol, meta)
    B = _assemble(tuple(pieces), jnp.asarray(row_map, dtype=jnp.int32),
                  jnp.asarray(np.argsort(order), dtype=jnp.int32))
    return B


def _row_maps(mol, bc, npad):
    """Flat AO ids (i*nao+j) and (j*nao+i) plus piece-row positions."""
    nao = mol.nao
    ia = bc.ga.ao_off[bc.sel_a][:, None] + np.arange(bc.da)   # (nsel, da)
    jb = bc.gb.ao_off[bc.sel_b][:, None] + np.arange(bc.db)
    rows_ij = (ia[:, :, None] * nao + jb[:, None, :]).reshape(-1)
    rows_ji = (jb[:, None, :] * nao + ia[:, :, None]).reshape(-1)
    rowpos = np.arange(bc.nsel * bc.ns1)
    return rows_ij, rows_ji, rowpos
