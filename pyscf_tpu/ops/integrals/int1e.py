"""One-electron integrals: overlap, kinetic, nuclear attraction, dipole.

Batched McMurchie-Davidson over angular-momentum class pairs. All
(shell-pair, primitive-pair) combinations of a class are flattened into one
m-axis padded to fixed chunks, so each kernel compiles once per class
(persistent jit cache) independent of molecule size; the nuclear kernel pads
the atom axis to small buckets. Host-side assembly (cart->sph + scatter)
runs once per geometry. Replaces the reference's per-shell-pair C loops
(pyscf/gto/moleintor.py getints2c:475 -> libcint int1e_* kernels).
"""
from functools import partial, lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..device import on_integral_device
from .cart2sph import cart2sph
from .hermite import e1d_dense, e3d, cart_components, hermite_R

CHUNK = 1024


@lru_cache(maxsize=None)
def _cart_idx(la, lb):
    ca = np.array(cart_components(la), dtype=np.int32)
    cb = np.array(cart_components(lb), dtype=np.int32)
    return ca, cb


def _dense_e(la, lb, a, b, A, B):
    return [e1d_dense(la, lb, a, b, A[..., d] - B[..., d]) for d in range(3)]


@partial(jax.jit, static_argnums=(0, 1))
def ovlp_chunk(la, lb, a, b, A, B, w):
    """Overlap for a chunk of primitive pairs: (C, ncart_a, ncart_b)."""
    p = a + b
    E = _dense_e(la, lb, a, b, A, B)
    q = jnp.pi / p
    # q * sqrt(q), NOT q**1.5: this host's XLA:CPU lowers f64 pow at
    # small static shapes through an f32-accurate path (measured 3.9e-8
    # relative error at shape (1,)); sqrt is correctly rounded everywhere
    ww = w * q * jnp.sqrt(q)
    ia, jb = _cart_idx(la, lb)
    v = (E[0][..., ia[:, None, 0], jb[None, :, 0], 0]
         * E[1][..., ia[:, None, 1], jb[None, :, 1], 0]
         * E[2][..., ia[:, None, 2], jb[None, :, 2], 0])
    return ww[:, None, None] * v


@partial(jax.jit, static_argnums=(0, 1))
def kin_chunk(la, lb, a, b, A, B, w):
    """Kinetic energy -1/2 <a|del^2|b> for a chunk of primitive pairs."""
    p = a + b
    E = _dense_e(la, lb + 2, a, b, A, B)
    sq = jnp.sqrt(jnp.pi / p)
    ia, jb = _cart_idx(la, lb)
    S1 = [E[d][..., 0] * sq[..., None, None] for d in range(3)]
    jvals = np.arange(lb + 3)
    T1 = []
    for d in range(3):
        s = S1[d]                        # (C, la+1, lb+3)
        t = (-2.0 * (b * b)[..., None, None] * s[..., 2:]
             + b[..., None, None] * (2 * jvals[:lb + 1] + 1) * s[..., :lb + 1])
        if lb >= 2:
            corr = 0.5 * (jvals[2:lb + 1] * (jvals[2:lb + 1] - 1)) \
                * s[..., :lb - 1]
            t = t.at[..., 2:].add(-corr)
        T1.append(t)

    def gsel(M, d):
        return M[..., ia[:, None, d], jb[None, :, d]]

    v = (gsel(T1[0], 0) * gsel(S1[1], 1) * gsel(S1[2], 2)
         + gsel(S1[0], 0) * gsel(T1[1], 1) * gsel(S1[2], 2)
         + gsel(S1[0], 0) * gsel(S1[1], 1) * gsel(T1[2], 2))
    return w[:, None, None] * v


@partial(jax.jit, static_argnums=(0, 1))
def nuc_chunk(la, lb, a, b, A, B, w, atom_coords, atom_charges):
    """Nuclear attraction -sum_C Z_C <a|1/|r-C||b> for a chunk of prim pairs."""
    p = a + b
    P = (a[:, None] * A + b[:, None] * B) / p[:, None]
    E3 = e3d(la, lb, a, b, A, B)              # (C, nca, ncb, ntuv)
    PC = P[:, None, :] - atom_coords          # (C, natm, 3)
    R = hermite_R(la + lb, p[:, None], PC)    # (C, natm, ntuv)
    RZ = jnp.einsum('mct,c->mt', R, atom_charges)
    return -jnp.einsum('m,mpqt,mt->mpq', w * (2.0 * jnp.pi / p), E3, RZ)


@partial(jax.jit, static_argnums=(0, 1))
def r_chunk(la, lb, a, b, A, B, w):
    """Dipole <a|r_d|b>: (3, C, ncart_a, ncart_b)."""
    p = a + b
    E = _dense_e(la, lb + 1, a, b, A, B)
    sq = jnp.sqrt(jnp.pi / p)
    ia, jb = _cart_idx(la, lb)
    S1 = [E[d][..., 0] * sq[..., None, None] for d in range(3)]

    def gsel(M, d):
        return M[..., ia[:, None, d], jb[None, :, d]]

    def gsel_jp1(M, d):
        return M[..., ia[:, None, d], jb[None, :, d] + 1]

    out = []
    for d in range(3):
        v = gsel_jp1(S1[d], d) + B[:, d, None, None] * gsel(S1[d], d)
        for dd in range(3):
            if dd != d:
                v = v * gsel(S1[dd], dd)
        out.append(w[:, None, None] * v)
    return jnp.stack(out)


def _flatten_pairs(ga, gb):
    """Flatten (shell-pair, prim-pair) combos to 1D arrays (host side)."""
    nsa, Ka = ga.exps.shape
    nsb, Kb = gb.exps.shape
    a = np.broadcast_to(ga.exps[:, None, :, None], (nsa, nsb, Ka, Kb)).ravel()
    b = np.broadcast_to(gb.exps[None, :, None, :], (nsa, nsb, Ka, Kb)).ravel()
    w = (ga.coeffs[:, None, :, None] * gb.coeffs[None, :, None, :]).ravel()
    A = np.broadcast_to(ga.coords[:, None, None, None, :],
                        (nsa, nsb, Ka, Kb, 3)).reshape(-1, 3)
    B = np.broadcast_to(gb.coords[None, :, None, None, :],
                        (nsa, nsb, Ka, Kb, 3)).reshape(-1, 3)
    return a, b, A, B, w


def _run_chunked(kernel, la, lb, ga, gb, extra=(), ncomp=0):
    """Run a chunked kernel over all prim pairs; reduce to shell blocks."""
    a, b, A, B, w = _flatten_pairs(ga, gb)
    m = a.size
    nchunk = -(-m // CHUNK)
    pad = nchunk * CHUNK - m
    a = np.pad(a, (0, pad), constant_values=1.0)
    b = np.pad(b, (0, pad), constant_values=1.0)
    w = np.pad(w, (0, pad))
    A = np.pad(A, ((0, pad), (0, 0)))
    B = np.pad(B, ((0, pad), (0, 0)))
    outs = []
    for i in range(nchunk):
        s = slice(i * CHUNK, (i + 1) * CHUNK)
        blk = kernel(la, lb, jnp.asarray(a[s]), jnp.asarray(b[s]),
                     jnp.asarray(A[s]), jnp.asarray(B[s]), jnp.asarray(w[s]),
                     *extra)
        outs.append(np.asarray(blk))
    out = np.concatenate(outs, axis=1 if ncomp else 0)
    nsa, Ka = ga.exps.shape
    nsb, Kb = gb.exps.shape
    nca = len(cart_components(la))
    ncb = len(cart_components(lb))
    if ncomp:
        out = out[:, :m].reshape(ncomp, nsa, nsb, Ka * Kb, nca, ncb)
        return out.sum(axis=3)
    out = out[:m].reshape(nsa, nsb, Ka * Kb, nca, ncb)
    return out.sum(axis=2)


def _assemble(mol, kernel, ncomp=0, extra=()):
    nao = mol.nao
    shape = (ncomp, nao, nao) if ncomp else (nao, nao)
    out = np.zeros(shape)
    for la, ga in mol.shell_groups.items():
        Sa = cart2sph(la)
        ia = (ga.ao_off[:, None] + np.arange(2 * la + 1)).ravel()
        for lb, gb in mol.shell_groups.items():
            Sb = cart2sph(lb)
            jb = (gb.ao_off[:, None] + np.arange(2 * lb + 1)).ravel()
            blk = _run_chunked(kernel, la, lb, ga, gb, extra, ncomp)
            blk = np.einsum('mp,...abpq,nq->...ambn', Sa, blk, Sb,
                            optimize=True)
            if ncomp:
                out[:, np.ix_(ia, jb)[0], np.ix_(ia, jb)[1]] = \
                    blk.reshape(ncomp, ia.size, jb.size)
            else:
                out[np.ix_(ia, jb)] = blk.reshape(ia.size, jb.size)
    return jnp.asarray(out)


@on_integral_device
def int1e_ovlp(mol):
    return _assemble(mol, ovlp_chunk)


def _cross_1e(mol1, mol2, kernel):
    out = np.zeros((mol1.nao, mol2.nao))
    for la, ga in mol1.shell_groups.items():
        Sa = cart2sph(la)
        ia = (ga.ao_off[:, None] + np.arange(2 * la + 1)).ravel()
        for lb, gb in mol2.shell_groups.items():
            Sb = cart2sph(lb)
            jb = (gb.ao_off[:, None] + np.arange(2 * lb + 1)).ravel()
            blk = _run_chunked(kernel, la, lb, ga, gb)
            blk = np.einsum('mp,abpq,nq->ambn', Sa, blk, Sb, optimize=True)
            out[np.ix_(ia, jb)] = blk.reshape(ia.size, jb.size)
    return out


@on_integral_device
def int1e_ovlp_cross(mol1, mol2):
    """Overlap between the AO bases of two molecules: (nao1, nao2)."""
    return jnp.asarray(_cross_1e(mol1, mol2, ovlp_chunk))


@on_integral_device
def int1e_kin_cross(mol1, mol2):
    """Kinetic energy between two AO bases (e.g. lattice-image pairs)."""
    return jnp.asarray(_cross_1e(mol1, mol2, kin_chunk))


@on_integral_device
def int1e_kin(mol):
    return _assemble(mol, kin_chunk)


ATOM_PAD = 8


@on_integral_device
def int1e_nuc(mol):
    natm_pad = -(-mol.natm // ATOM_PAD) * ATOM_PAD
    coords = np.zeros((natm_pad, 3))
    coords[:mol.natm] = mol.coords
    z = np.zeros(natm_pad)
    z[:mol.natm] = mol.charges
    return _assemble(mol, nuc_chunk,
                     extra=(jnp.asarray(coords), jnp.asarray(z)))


@on_integral_device
def int1e_r(mol):
    return _assemble(mol, r_chunk, ncomp=3)


@partial(jax.jit, static_argnums=(0, 1))
def rinv_points_chunk(la, lb, a, b, A, B, w, points):
    """<a| 1/|r-P_g| |b> per grid point: (C, npts, nca, ncb).

    Backs the seminumerical-exchange (SGX/COSX) G-tensor (reference
    sgx/sgx_jk.py _gen_batch_nuc -> fakemol int3c2e path)."""
    p = a + b
    P = (a[:, None] * A + b[:, None] * B) / p[:, None]
    E3 = e3d(la, lb, a, b, A, B)                  # (C, nca, ncb, ntuv)
    PC = P[:, None, :] - points                   # (C, npts, 3)
    R = hermite_R(la + lb, p[:, None], PC)        # (C, npts, ntuv)
    return jnp.einsum('m,mpqt,mgt->mgpq', w * (2.0 * jnp.pi / p), E3, R)


@on_integral_device
def int1e_rinv_points(mol, points):
    """(npts, nao, nao) tensor of 1/|r - r_g| integrals for given points."""
    points = np.asarray(points)
    npts = len(points)
    nao = mol.nao
    out = np.zeros((npts, nao, nao))
    pts = jnp.asarray(points)
    for la, ga in mol.shell_groups.items():
        Sa = cart2sph(la)
        ia = (ga.ao_off[:, None] + np.arange(2 * la + 1)).ravel()
        for lb, gb in mol.shell_groups.items():
            Sb = cart2sph(lb)
            jb = (gb.ao_off[:, None] + np.arange(2 * lb + 1)).ravel()
            a, b, A, B, w = _flatten_pairs(ga, gb)
            m = a.size
            nchunk = -(-m // CHUNK)
            pad = nchunk * CHUNK - m
            a = np.pad(a, (0, pad), constant_values=1.0)
            b = np.pad(b, (0, pad), constant_values=1.0)
            w = np.pad(w, (0, pad))
            A = np.pad(A, ((0, pad), (0, 0)))
            B = np.pad(B, ((0, pad), (0, 0)))
            outs = []
            for i in range(nchunk):
                s = slice(i * CHUNK, (i + 1) * CHUNK)
                blk = rinv_points_chunk(la, lb, jnp.asarray(a[s]),
                                        jnp.asarray(b[s]), jnp.asarray(A[s]),
                                        jnp.asarray(B[s]), jnp.asarray(w[s]),
                                        pts)
                outs.append(np.asarray(blk))
            blk = np.concatenate(outs, axis=0)[:m]
            nsa, Ka = ga.exps.shape
            nsb, Kb = gb.exps.shape
            nca = len(cart_components(la))
            ncb = len(cart_components(lb))
            blk = blk.reshape(nsa, nsb, Ka * Kb, npts, nca, ncb).sum(axis=2)
            blk = np.einsum('mp,abgpq,nq->gambn', Sa, blk, Sb, optimize=True)
            out[:, np.ix_(ia, jb)[0], np.ix_(ia, jb)[1]] = blk.reshape(
                npts, ia.size, jb.size)
    return jnp.asarray(out)
