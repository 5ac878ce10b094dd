"""Analytic Fourier transform of AO pair products.

Reference analog: pyscf/gto/ft_ao.py + C lib/gto/ft_ao.c (and the
periodic wrapper pyscf/pbc/df/ft_ao.py). For a Gaussian pair expanded in
Hermite functions about P with exponent p:

  F_uv(G) = int u(r) v(r) e^{-iG.r} dr
          = sum_tuv E_tuv (-iGx)^t (-iGy)^u (-iGz)^v
            (pi/p)^{3/2} e^{-G^2/(4p)} e^{-iG.P}

one dense (primitive-pairs x G) outer product per angular class — the
same McMurchie-Davidson E tables as the real-space integrals, no
quadrature.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .cart2sph import cart2sph
from .hermite import cart_components, e3d, tuv_components

FT_CHUNK = 256


@partial(jax.jit, static_argnums=(0, 1))
def ft_pair_chunk(la, lb, a, b, A, B, w, Gv):
    """FT of primitive pair products: (nG, nca, ncb) accumulated over the
    chunk's primitive-pair axis."""
    p = a + b
    P = (a[:, None] * A + b[:, None] * B) / p[:, None]
    E3 = e3d(la, lb, a, b, A, B)                  # (C, nca, ncb, ntuv)
    G2 = jnp.einsum('gx,gx->g', Gv, Gv)
    damp = jnp.exp(-G2[None, :] / (4.0 * p[:, None]))    # (C, nG)
    phase = jnp.exp(-1j * (P @ Gv.T))                    # (C, nG)
    _q = jnp.pi / p
    pref = (w * _q * jnp.sqrt(_q))[:, None] * damp * phase
    tuvs = np.array(tuv_components(la + lb), dtype=np.int64)
    # (-iG)^tuv for every Hermite component: (ntuv, nG)
    miG = -1j * Gv                                        # (nG, 3)
    gpow = (miG[None, :, 0] ** tuvs[:, 0:1]
            * miG[None, :, 1] ** tuvs[:, 1:2]
            * miG[None, :, 2] ** tuvs[:, 2:3])            # (ntuv, nG)
    # sum over chunk and Hermite components
    ce = jnp.einsum('cabt,cg->gabt', E3 + 0j, pref)
    return jnp.einsum('gabt,tg->gab', ce, gpow)


def ft_aopair(mol, Gv, shift=None, shifts=None, phases=None):
    """(nG, nao, nao) complex: int u(r) v(r) e^{-iGr}.

    shift displaces the KET AO centers by one vector; shifts (nL, 3)
    sums over many ket displacements (lattice images) inside the same
    chunked primitive stream -- one dispatch sequence for the whole sum.
    phases (nL,) complex weights each ket image (Bloch phases e^{i k.L}
    for k-point pair densities, reference pbc/df/ft_ao.py); default 1.
    """
    Gv = jnp.asarray(np.asarray(Gv, dtype=float).reshape(-1, 3))
    nG = Gv.shape[0]
    nao = mol.nao
    out = np.zeros((nG, nao, nao), dtype=complex)
    for la, ga in mol.shell_groups.items():
        Sa = cart2sph(la)
        ia = (ga.ao_off[:, None] + np.arange(2 * la + 1)).ravel()
        for lb, gb in mol.shell_groups.items():
            Sb = cart2sph(lb)
            jb = (gb.ao_off[:, None] + np.arange(2 * lb + 1)).ravel()
            nsa, Ka = ga.exps.shape
            nsb, Kb = gb.exps.shape
            a = np.repeat(ga.exps[:, None, :, None], nsb, 1).repeat(Kb, 3)
            b = np.repeat(gb.exps[None, :, None, :], nsa, 0).repeat(Ka, 2)
            wa = np.repeat(ga.coeffs[:, None, :, None], nsb, 1)
            wb = np.repeat(gb.coeffs[None, :, None, :], nsa, 0)
            w = (wa.repeat(Kb, 3) * wb.repeat(Ka, 2)).reshape(-1)
            A = np.repeat(ga.coords[:, None, :], nsb, 1)
            A = np.repeat(A[:, :, None, :], Ka * Kb, 2).reshape(-1, 3)
            Bc = np.repeat(gb.coords[None, :, :], nsa, 0)
            Bc = np.repeat(Bc[:, :, None, :], Ka * Kb, 2).reshape(-1, 3)
            if shift is not None:
                Bc = Bc + np.asarray(shift)[None, :]
            af = a.reshape(-1)
            bf = b.reshape(-1)
            wf = w
            if shifts is not None:
                # replicate every primitive pair for each ket image,
                # screened by the Gaussian-pair distance bound
                sh = np.asarray(shifts)
                nL = len(sh)
                mu = af * bf / (af + bf)
                d2 = np.sum((A[:, None, :] - Bc[:, None, :]
                             - sh[None, :, :]) ** 2, axis=-1)  # (m0, nL)
                keep = (mu[:, None] * d2) < 46.0               # e^-46~1e-20
                idx_p, idx_L = np.nonzero(keep)
                af = af[idx_p]
                bf = bf[idx_p]
                wf = w[idx_p]
                A = A[idx_p]
                Bc = Bc[idx_p] + sh[idx_L]
            w = wf
            m = af.size
            nca, ncb = len(cart_components(la)), len(cart_components(lb))
            blk = np.zeros((nG, m, nca, ncb), dtype=complex)
            for i0 in range(0, m, FT_CHUNK):
                s = slice(i0, min(i0 + FT_CHUNK, m))
                npad = FT_CHUNK - (s.stop - s.start)
                ap = np.pad(af[s], (0, npad), constant_values=1.0)
                bp = np.pad(bf[s], (0, npad), constant_values=1.0)
                wp = np.pad(w[s], (0, npad))
                Ap = np.pad(A[s], ((0, npad), (0, 0)))
                Bp = np.pad(Bc[s], ((0, npad), (0, 0)))
                # per-pair FT without chunk reduction: move reduction out
                val = _ft_pair_noreduce(la, lb, jnp.asarray(ap),
                                        jnp.asarray(bp), jnp.asarray(Ap),
                                        jnp.asarray(Bp), jnp.asarray(wp),
                                        Gv)
                blk[:, s] = np.asarray(val)[:, :s.stop - s.start]
            if shifts is None:
                blk = blk.reshape(nG, nsa, nsb, Ka * Kb, nca,
                                  ncb).sum(axis=3)
            else:
                # scatter-reduce image-replicated pairs onto shell pairs
                shell_idx = idx_p // (Ka * Kb)
                accT = np.zeros((nsa * nsb, nG, nca, ncb), dtype=complex)
                vals = blk.transpose(1, 0, 2, 3)
                if phases is not None:
                    vals = vals * np.asarray(phases)[idx_L][
                        :, None, None, None]
                np.add.at(accT, shell_idx, vals)
                blk = accT.transpose(1, 0, 2, 3).reshape(
                    nG, nsa, nsb, nca, ncb)
            blk = np.einsum('mp,gabpq,nq->gambn', Sa, blk, Sb,
                            optimize=True)
            out[:, np.ix_(ia, jb)[0], np.ix_(ia, jb)[1]] = \
                blk.reshape(nG, ia.size, jb.size)
    return out


@partial(jax.jit, static_argnums=(0, 1))
def _ft_pair_noreduce(la, lb, a, b, A, B, w, Gv):
    """Per-primitive-pair FT: (nG, C, nca, ncb)."""
    p = a + b
    P = (a[:, None] * A + b[:, None] * B) / p[:, None]
    E3 = e3d(la, lb, a, b, A, B)
    G2 = jnp.einsum('gx,gx->g', Gv, Gv)
    damp = jnp.exp(-G2[None, :] / (4.0 * p[:, None]))
    phase = jnp.exp(-1j * (P @ Gv.T))
    _q = jnp.pi / p
    pref = (w * _q * jnp.sqrt(_q))[:, None] * damp * phase   # (C, nG)
    tuvs = np.array(tuv_components(la + lb), dtype=np.int64)
    miG = -1j * Gv
    gpow = (miG[None, :, 0] ** tuvs[:, 0:1]
            * miG[None, :, 1] ** tuvs[:, 1:2]
            * miG[None, :, 2] ** tuvs[:, 2:3])                 # (ntuv, nG)
    return jnp.einsum('cabt,cg,tg->gcab', E3 + 0j, pref, gpow)


def ft_aopair_pbc(cell, Gv):
    """Periodic FT(AO pair) at Gamma: ket lattice images folded into one
    screened primitive stream."""
    Ls = np.asarray(cell.get_lattice_Ls())
    return ft_aopair(cell, Gv, shifts=Ls)


@partial(jax.jit, static_argnums=(0,))
def _ft_single_chunk(l, a, A, w, Gv):
    """FT of single solid-harmonic-Gaussian shells: (nG, C, ncart)."""
    E3 = e3d(l, 0, a, jnp.zeros_like(a), A, A)       # (C, ncart, 1, ntuv)
    G2 = jnp.einsum('gx,gx->g', Gv, Gv)
    damp = jnp.exp(-G2[None, :] / (4.0 * a[:, None]))
    phase = jnp.exp(-1j * (A @ Gv.T))
    _q = jnp.pi / a
    pref = (w * _q * jnp.sqrt(_q))[:, None] * damp * phase   # (C, nG)
    tuvs = np.array(tuv_components(l), dtype=np.int64)
    miG = -1j * Gv
    gpow = (miG[None, :, 0] ** tuvs[:, 0:1]
            * miG[None, :, 1] ** tuvs[:, 1:2]
            * miG[None, :, 2] ** tuvs[:, 2:3])                 # (ntuv, nG)
    return jnp.einsum('cat,cg,tg->gca', E3[:, :, 0, :] + 0j, pref, gpow)


def ft_ao(mol, Gv):
    """(nG, nao) complex: FT of every AO, int u(r) e^{-iG.r} dr.

    For a periodic cell this IS the unit-cell FT of the Bloch AO at
    G + k (single-image identity; reference pbc/df/ft_ao.py ft_ao)."""
    Gv = jnp.asarray(np.asarray(Gv, dtype=float).reshape(-1, 3))
    nG = Gv.shape[0]
    out = np.zeros((nG, mol.nao), dtype=complex)
    for l, g in mol.shell_groups.items():
        S = cart2sph(l)
        nsh, K = g.exps.shape
        a = np.asarray(g.exps).reshape(-1)
        w = np.asarray(g.coeffs).reshape(-1)
        A = np.repeat(np.asarray(g.coords)[:, None, :], K, 1).reshape(-1, 3)
        ok = w != 0
        val = np.zeros((nG, nsh * K, len(cart_components(l))),
                       dtype=complex)
        if ok.any():
            val[:, ok] = np.asarray(_ft_single_chunk(
                l, jnp.asarray(a[ok]), jnp.asarray(A[ok]),
                jnp.asarray(w[ok]), Gv))
        val = val.reshape(nG, nsh, K, -1).sum(axis=2)     # (nG, nsh, ncart)
        sph = np.einsum('mc,gsc->gsm', S, val).reshape(nG, -1)
        cols = (g.ao_off[:, None] + np.arange(2 * l + 1)).ravel()
        out[:, cols] = sph
    return out


def ft_aopair_kpt(cell, Gv, kptj):
    """Periodic FT(AO pair) for a k-point pair: (nG, nao, nao) with
    A_{mu,nu}(G) = sum_L e^{i kptj.L} int u(r) v(r - L) e^{-iG.r} dr.

    Evaluate at Gv = G + q (q = kj - ki) to get the unit-cell FT of the
    Bloch pair density conj(phi_{mu ki}) phi_{nu kj} (reference
    pbc/df/ft_ao.py ft_aopair_kpts)."""
    Ls = np.asarray(cell.get_lattice_Ls())
    phases = np.exp(1j * (Ls @ np.asarray(kptj, dtype=float)))
    return ft_aopair(cell, Gv, shifts=Ls, phases=phases)
