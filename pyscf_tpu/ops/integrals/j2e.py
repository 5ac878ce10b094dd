"""Device-resident full (ab|cd) ERI engine (v2 machinery of j3c.py).

For the in-core paths (small-molecule SCF, conventional ao2mo for
MP2/CCSD(T)): the legacy `int2e.int2e` generates on the host CPU with
per-chunk round-trips - at N2/cc-pVQZ (nao=110, l up to g) that is 30+
minutes on this 1-core host, while the screened sph-folded engine runs
the same quartets on the accelerator in seconds-to-minutes.

Same design rules as j3c.py: sph transforms folded into the Hermite E
tables, (ij) pair rows stored once with all AO orderings resolved by the
final gather ((ab|cd)=(ba|cd)=(ab|dc)=(cd|ab) share one entry via the
row map on BOTH axes), one compiled program per ORDERED bra-class pair
with budget-bounded chunk/tile sizes.

Reference analog: libcint int2e via pyscf/gto/moleintor.py getints4c:603
+ the in-core SCF path scf/_vhf.py:283.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .hermite import n_tuv, hermite_R
from .int2e import _comb_onehot3
from .j3c import (_bra_classes, _pair_sph_tables, _row_maps, BUDGET_ELEMS)


def _pick_chunks_4c(KK1, ns1, nt1, KK2, ns2, nt2, L):
    """(bra_pair_chunk, ket_pair_tile) under the element budget."""
    ntL = n_tuv(L)
    per = max(ntL, ns2 * nt1, ns1 * ns2)
    prod = max(4096, BUDGET_ELEMS // per)
    C2 = min(4096, max(KK2, prod // 512))
    npk = max(1, C2 // KK2)
    C2 = npk * KK2
    C1 = max(KK1, min(prod // C2, 8192))
    npb = max(1, C1 // KK1)
    return npb, npk


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 17))
def _class_pair_program(la, lb, lc, ld, npk,
                        ea, ca, ra, eb, cb, rb,
                        ec, cc_, rc, ed, cd, rd, rs_omega=None):
    """(bra-class pairs | ket-class pairs), prim-summed, sph.

    Bra arrays (nchunk_b, npb, K*); ket arrays (nchunk_k*npk, K*) flat
    (retiled inside). Returns (nchunk_b*npb*ns1, nket_pad*ns2) rows.
    """
    L1, L2 = la + lb, lc + ld
    L = L1 + L2
    ntL = n_tuv(L)
    W3 = jnp.asarray(_comb_onehot3(L1, L2))
    da, db, dc, dd = (2 * la + 1, 2 * lb + 1, 2 * lc + 1, 2 * ld + 1)
    ns1, ns2 = da * db, dc * dd
    nket = ec.shape[0]
    ntile = nket // npk

    ket = tuple(x.reshape((ntile, npk) + x.shape[1:])
                for x in (ec, cc_, rc, ed, cd, rd))

    def bra_chunk(carry, ch):
        p1, P1, E1 = _pair_sph_tables(la, lb, *ch)
        C1 = p1.shape[0]
        nt1 = E1.shape[-1]

        def ket_tile(carry2, ch2):
            p2, P2, E2 = _pair_sph_tables(lc, ld, *ch2)
            C2 = p2.shape[0]
            nt2 = E2.shape[-1]
            pp = p1[:, None] * p2[None, :]
            ps = p1[:, None] + p2[None, :]
            omega = pp / ps
            pref = 2.0 * jnp.pi ** 2.5 / (pp * jnp.sqrt(ps))
            if rs_omega is not None:
                theta = rs_omega ** 2 / (rs_omega ** 2 + omega)
                omega = omega * theta
                pref = pref * jnp.sqrt(theta)
            rpq = P1[:, None, :] - P2[None, :, :]
            R = hermite_R(L, omega, rpq) * pref[..., None]
            P2f = jnp.einsum('bqt,stL->bqsL', E2, W3)
            Q = jax.lax.dot_general(
                R, P2f.reshape(C2, ns2 * nt1, ntL),
                dimension_numbers=(((2,), (2,)), ((1,), (0,))),
                preferred_element_type=R.dtype)       # (C2, C1, q*s)
            KK2 = C2 // npk
            Q = Q.reshape(npk, KK2, C1, ns2, nt1).sum(axis=1)
            KK1 = ch[0].shape[1] * ch[3].shape[1]   # Ka * Kb of the bra
            npb = C1 // KK1
            Q = Q.reshape(npk, npb, KK1, ns2, nt1)
            out = jnp.einsum('akps,xakqs->apxq',
                             E1.reshape(npb, KK1, ns1, nt1), Q)
            return carry2, out                        # (npb, ns1, npk, ns2)

        _, ys = jax.lax.scan(ket_tile, 0, ket)
        npb = ys.shape[1]
        ys = jnp.moveaxis(ys, 0, 2)                   # (npb, ns1, ntile, npk, ns2)
        return carry, ys.reshape(npb * ns1, ntile * npk * ns2)

    _, out = jax.lax.scan(bra_chunk, 0,
                          (ea, ca, ra, eb, cb, rb))
    return out.reshape(-1, ntile * npk * ns2)


def _ket_arrays(bc, npk):
    """Flat zero-padded (nket_pad, K)/(nket_pad, 3) ket pair arrays."""
    nsel = bc.nsel
    npad = max(1, -(-nsel // npk)) * npk
    ec = np.ones((npad, bc.Ka)); cc_ = np.zeros((npad, bc.Ka))
    rc = np.zeros((npad, 3))
    ed = np.ones((npad, bc.Kb)); cd = np.zeros((npad, bc.Kb))
    rd = np.zeros((npad, 3))
    ec[:nsel] = bc.ga.exps[bc.sel_a]
    cc_[:nsel] = bc.ga.coeffs[bc.sel_a]
    rc[:nsel] = bc.ga.coords[bc.sel_a]
    ed[:nsel] = bc.gb.exps[bc.sel_b]
    cd[:nsel] = bc.gb.coeffs[bc.sel_b]
    rd[:nsel] = bc.gb.coords[bc.sel_b]
    return ec, cc_, rc, ed, cd, rd, npad


@jax.jit
def _assemble_4c(pieces, row_map, col_maps):
    """Stack class-pair pieces -> dense (nao, nao, nao, nao)."""
    nao2 = row_map.shape[0]
    nao = int(np.sqrt(nao2))
    # pieces: dict rows by bra class; each piece's columns are gathered
    # to dense kl first, then rows to dense ij
    rows = []
    for piece, col_map in zip(pieces, col_maps):
        z = jnp.zeros((piece.shape[0], 1), piece.dtype)
        rows.append(jnp.take(jnp.concatenate([piece, z], axis=1),
                             col_map, axis=1))
    V = jnp.concatenate(rows + [jnp.zeros((1, nao2), rows[0].dtype)],
                        axis=0)
    out = jnp.take(V, row_map, axis=0)
    return out.reshape(nao, nao, nao, nao)


def int2e_dense(mol, omega=None):
    """Full (nao,)^4 chemists' ERI tensor, built on the default device."""
    bra = _bra_classes(mol)
    nao = mol.nao
    classes = [(k, bc) for k, bc in bra.items() if bc.nsel > 0]
    pieces = []
    col_maps = []
    row_ids = []
    for (la, lb), bc in classes:
        col_entries = []    # (flat kl ids, piece-col positions)
        ncol_off = 0
        outs = []
        picks = [_pick_chunks_4c(
            bc.KK, bc.ns1, bc.nt1, kc.KK, kc.ns1, n_tuv(lc + ld),
            la + lb + lc + ld) for (lc, ld), kc in classes]
        npb = min(p[0] for p in picks)      # one bra chunking for all kets
        if npb > bc.nsel:
            npb = 1 << (bc.nsel - 1).bit_length() if bc.nsel > 1 else 1
        (ea, ca, ra, eb, cb, rb), nchunk = bc.chunk_arrays(npb)
        for ((lc, ld), kc), (_, npk) in zip(classes, picks):
            ec, cc_, rc, ed, cd, rd, nkpad = _ket_arrays(kc, npk)
            ys = _class_pair_program(
                la, lb, lc, ld, npk,
                jnp.asarray(ea), jnp.asarray(ca), jnp.asarray(ra),
                jnp.asarray(eb), jnp.asarray(cb), jnp.asarray(rb),
                jnp.asarray(ec), jnp.asarray(cc_), jnp.asarray(rc),
                jnp.asarray(ed), jnp.asarray(cd), jnp.asarray(rd),
                rs_omega=omega)
            outs.append(ys)
            kl_ij, kl_ji, kl_pos = _row_maps(mol, kc, nkpad)
            col_entries.append((kl_ij, kl_ji, kl_pos, ncol_off,
                                ys.shape[1]))
            ncol_off += ys.shape[1]
        piece = jnp.concatenate(outs, axis=1)
        # column map: flat (k*nao+l) -> column of this piece (or zero col)
        col_map = np.full(nao * nao, piece.shape[1], dtype=np.int64)
        for kl_ij, kl_ji, kl_pos, off, ncols in col_entries:
            col_map[kl_ij] = off + kl_pos
            col_map[kl_ji] = off + kl_pos
        pieces.append(piece)
        col_maps.append(jnp.asarray(col_map, dtype=jnp.int32))
        row_ids.append(_row_maps(mol, bc, piece.shape[0] // bc.ns1))
    nrows = sum(p.shape[0] for p in pieces)
    row_map = np.full(nao * nao, nrows, dtype=np.int64)
    off = 0
    for (rows_ij, rows_ji, rowpos), piece in zip(row_ids, pieces):
        row_map[rows_ij] = off + rowpos
        row_map[rows_ji] = off + rowpos
        off += piece.shape[0]
    return _assemble_4c(tuple(pieces),
                        jnp.asarray(row_map, dtype=jnp.int32),
                        tuple(col_maps))
