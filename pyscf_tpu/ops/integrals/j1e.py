"""Device-resident hcore engine: screened ovlp/kin/nuc in few programs.

The legacy `int1e` path (int1e.py) evaluates the FULL shell-pair product
with host-side assembly; at 580 AO / cc-pVTZ on this 1-core host that
phase costs ~20 minutes. Here the screened pair machinery of the DF
engine (j3c.py) is reused: one compiled program per bra angular class
computes overlap + kinetic + nuclear rows together on the accelerator,
and one gather assembles (S, T, V) without touching the host.

Reference analog: libcint int1e_ovlp/int1e_kin/int1e_nuc driven by
pyscf/gto/moleintor.py getints2c:475.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .cart2sph import cart2sph
from .int1e import ovlp_chunk, kin_chunk, nuc_chunk
from .j3c import _bra_classes, _row_maps

_ATOM_PAD = 8


def _sph(l):
    return jnp.asarray(cart2sph(l))


@partial(jax.jit, static_argnums=(0, 1))
def _class_stv(la, lb, ea, ca, ra, eb, cb, rb, Zr, Zq):
    """(nchunk*npc, ns1, 3) sph rows of [S, T, V] for one bra class.

    ea.. (nchunk, npc, K*) padded chunk arrays (j3c layout); Zr (natm_pad,
    3) atom coords, Zq (natm_pad,) charges (zero-padded)."""
    Sa, Sb = _sph(la), _sph(lb)

    def one_chunk(carry, ch):
        ea_c, ca_c, ra_c, eb_c, cb_c, rb_c = ch
        npc, Ka = ea_c.shape
        Kb = eb_c.shape[1]
        m = npc * Ka * Kb
        a = jnp.broadcast_to(ea_c[:, :, None], (npc, Ka, Kb)).reshape(m)
        b = jnp.broadcast_to(eb_c[:, None, :], (npc, Ka, Kb)).reshape(m)
        A = jnp.broadcast_to(ra_c[:, None, None, :],
                             (npc, Ka, Kb, 3)).reshape(m, 3)
        B = jnp.broadcast_to(rb_c[:, None, None, :],
                             (npc, Ka, Kb, 3)).reshape(m, 3)
        w = (ca_c[:, :, None] * cb_c[:, None, :]).reshape(m)
        s = ovlp_chunk.__wrapped__(la, lb, a, b, A, B, w)
        t = kin_chunk.__wrapped__(la, lb, a, b, A, B, w)
        v = nuc_chunk.__wrapped__(la, lb, a, b, A, B, w, Zr, Zq)
        stv = jnp.stack([s, t, v], axis=-1)       # (m, nca, ncb, 3)
        stv = stv.reshape(npc, Ka * Kb, stv.shape[1], stv.shape[2], 3)
        stv = stv.sum(axis=1)                     # prim-pair sum
        stv = jnp.einsum('mpqx,ap,bq->mabx', stv, Sa, Sb)
        return carry, stv.reshape(npc, Sa.shape[0] * Sb.shape[0], 3)

    _, ys = jax.lax.scan(one_chunk, 0, (ea, ca, ra, eb, cb, rb))
    return ys.reshape(-1, Sa.shape[0] * Sb.shape[0], 3)


@jax.jit
def _assemble_stv(pieces, row_map):
    V = jnp.concatenate(list(pieces)
                        + [jnp.zeros((1, 3), pieces[0].dtype)], axis=0)
    out = jnp.take(V, row_map, axis=0)                  # (nao*nao, 3)
    nao = int(np.sqrt(row_map.shape[0]))
    return out.T.reshape(3, nao, nao)


def hcore_parts(mol):
    """(S, T, V) as one device-resident (3, nao, nao) computation.

    Cached on the Mole; S/T/V symmetric so the (ij)==(ji) row sharing of
    the j3c engine applies unchanged."""
    cache = getattr(mol, '_j3c_cache', None)
    if cache is None:
        cache = mol._j3c_cache = {}
    if 'stv' in cache:
        return cache['stv']
    bra = _bra_classes(mol)
    natm = mol.natm
    npad = -(-natm // _ATOM_PAD) * _ATOM_PAD
    Zr = np.zeros((npad, 3))
    Zq = np.zeros(npad)
    Zr[:natm] = np.asarray(mol.coords)
    Zq[:natm] = np.asarray(mol.charges)
    Zr, Zq = jnp.asarray(Zr), jnp.asarray(Zq)
    pieces = []
    row_ids = []
    nao = mol.nao
    for (la, lb), bc in bra.items():
        if bc.nsel == 0:
            continue
        # modest chunks: the 1e work is tiny next to the nuc R table
        npc = max(1, 4096 // bc.KK)
        if npc > bc.nsel:
            npc = 1 << (bc.nsel - 1).bit_length() if bc.nsel > 1 else 1
        (ea, ca, ra, eb, cb, rb), nchunk = bc.chunk_arrays(npc)
        ys = _class_stv(la, lb, jnp.asarray(ea), jnp.asarray(ca),
                        jnp.asarray(ra), jnp.asarray(eb), jnp.asarray(cb),
                        jnp.asarray(rb), Zr, Zq)
        pieces.append(ys.reshape(-1, 3))
        row_ids.append(_row_maps(mol, bc, nchunk * npc))
    nrows = sum(p.shape[0] for p in pieces)
    row_map = np.full(nao * nao, nrows, dtype=np.int64)
    off = 0
    for (rows_ij, rows_ji, rowpos), piece in zip(row_ids, pieces):
        row_map[rows_ij] = off + rowpos
        row_map[rows_ji] = off + rowpos
        off += piece.shape[0]
    stv = _assemble_stv(tuple(pieces),
                        jnp.asarray(row_map, dtype=jnp.int32))
    cache['stv'] = stv
    return stv
