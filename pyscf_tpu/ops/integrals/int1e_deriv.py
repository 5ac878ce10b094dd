"""Derivative one-electron integrals for analytic nuclear gradients.

Analog of the reference's int1e_ipovlp / int1e_ipkin / int1e_ipnuc /
int1e_iprinv libcint kernels (driven by pyscf/grad/rhf.py:33 grad_elec).

All derivatives act on the *bra* center A via the power-shift rule
  d/dA_x [x_A^i e^{-a x_A^2}] = 2a x_A^{i+1} - i x_A^{i-1},
expressed through the same dense 1D Hermite tables as the base integrals
(e1d_dense at la+1), keeping the chunked compile-once-per-class design.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..device import on_integral_device
from .cart2sph import cart2sph
from .hermite import e1d_dense, e3d, cart_components, tuv_components, \
    tuv_index, hermite_R
from .int1e import _cart_idx, _run_chunked, CHUNK


def _s1_tables(la_e, lb_e, a, b, A, B):
    p = a + b
    sq = jnp.sqrt(jnp.pi / p)
    E = [e1d_dense(la_e, lb_e, a, b, A[..., d] - B[..., d]) for d in range(3)]
    S1 = [E[d][..., 0] * sq[..., None, None] for d in range(3)]
    return S1, p


@partial(jax.jit, static_argnums=(0, 1))
def ipovlp_chunk(la, lb, a, b, A, B, w):
    """(d/dA <a| ) |b> overlap: (3, C, ncart_a, ncart_b)."""
    S1, p = _s1_tables(la + 1, lb, a, b, A, B)
    ia, jb = _cart_idx(la, lb)

    def gsel(M, d, di=0):
        return M[..., ia[:, None, d] + di, jb[None, :, d]]

    out = []
    for d in range(3):
        pw = ia[:, None, d]
        lower = S1[d][..., jnp.maximum(pw - 1, 0), jb[None, :, d]]
        v = 2.0 * a[:, None, None] * gsel(S1[d], d, 1) \
            - pw * jnp.where(pw > 0, lower, 0.0)
        for dd in range(3):
            if dd != d:
                v = v * gsel(S1[dd], dd)
        out.append(w[:, None, None] * v)
    return jnp.stack(out)


@partial(jax.jit, static_argnums=(0, 1))
def ipkin_chunk(la, lb, a, b, A, B, w):
    """d/dA of the kinetic-energy block: (3, C, ncart_a, ncart_b)."""
    la_e = la + 1
    p = a + b
    sq = jnp.sqrt(jnp.pi / p)
    E = [e1d_dense(la_e, lb + 2, a, b, A[..., d] - B[..., d])
         for d in range(3)]
    S1 = [E[d][..., 0] * sq[..., None, None] for d in range(3)]
    jvals = np.arange(lb + 3)
    T1 = []
    for d in range(3):
        s = S1[d]
        t = (-2.0 * (b * b)[..., None, None] * s[..., 2:]
             + b[..., None, None] * (2 * jvals[:lb + 1] + 1) * s[..., :lb + 1])
        if lb >= 2:
            corr = 0.5 * (jvals[2:lb + 1] * (jvals[2:lb + 1] - 1)) \
                * s[..., :lb - 1]
            t = t.at[..., 2:].add(-corr)
        T1.append(t)
    ia, jb = _cart_idx(la, lb)

    def sel(M, d, di=0):
        idx = jnp.maximum(ia[:, None, d] + di, 0)
        return M[..., idx, jb[None, :, d]]

    def dshift(M, d):
        pw = ia[:, None, d]
        return 2.0 * a[:, None, None] * sel(M, d, 1) \
            - pw * jnp.where(pw > 0, sel(M, d, -1), 0.0)

    out = []
    for d in range(3):
        terms = []
        for dt in range(3):     # which dim carries the T factor
            v = None
            for dd in range(3):
                fac = (T1[dd] if dd == dt else S1[dd])
                cur = dshift(fac, dd) if dd == d else sel(fac, dd)
                v = cur if v is None else v * cur
            terms.append(v)
        out.append(w[:, None, None] * (terms[0] + terms[1] + terms[2]))
    return jnp.stack(out)


@partial(jax.jit, static_argnums=(0, 1))
def ipnuc_chunk(la, lb, a, b, A, B, w, atom_coords, atom_charges):
    """d/dA of the nuclear-attraction block: (3, C, ncart_a, ncart_b)."""
    p = a + b
    P = (a[:, None] * A + b[:, None] * B) / p[:, None]
    L = la + 1 + lb
    E3p = e3d(la + 1, lb, a, b, A, B)        # (C, nca+, ncb, ntuv(L))
    if la >= 1:
        E3m = e3d(la - 1, lb, a, b, A, B)
    PC = P[:, None, :] - atom_coords
    R = hermite_R(L, p[:, None], PC)
    RZ = jnp.einsum('mct,c->mt', R, atom_charges)
    pref = w * (2.0 * jnp.pi / p)
    Vp = -jnp.einsum('m,mpqt,mt->mpq', pref, E3p, RZ)
    if la >= 1:
        ntm = E3m.shape[-1]
        Vm = -jnp.einsum('m,mpqt,mt->mpq', pref, E3m, RZ[:, :ntm])
    carts = cart_components(la)
    idxp = {c: i for i, c in enumerate(cart_components(la + 1))}
    if la >= 1:
        idxm = {c: i for i, c in enumerate(cart_components(la - 1))}
    out = []
    for d in range(3):
        cols = []
        for c in carts:
            up = list(c)
            up[d] += 1
            vterm = 2.0 * a[:, None] * Vp[:, idxp[tuple(up)], :]
            if c[d] >= 1:
                dn = list(c)
                dn[d] -= 1
                vterm = vterm - c[d] * Vm[:, idxm[tuple(dn)], :]
            cols.append(vterm)
        out.append(jnp.stack(cols, axis=1))
    return jnp.stack(out)


@partial(jax.jit, static_argnums=(0, 1))
def iprinv_chunk(la, lb, a, b, A, B, w, center):
    """d/dC of <a| 1/|r-C| |b> for one operator center C: (3, C, nca, ncb).

    Uses dR_tuv/dC_x = -R_{t+1,u,v}.
    """
    p = a + b
    P = (a[:, None] * A + b[:, None] * B) / p[:, None]
    L = la + lb
    E3 = e3d(la, lb, a, b, A, B)
    PC = P - center
    R = hermite_R(L + 1, p, PC)              # includes t+1 entries
    idx_hi = tuv_index(L + 1)
    tuvs = tuv_components(L)
    pref = w * (2.0 * jnp.pi / p)
    out = []
    for d in range(3):
        sel = np.array([idx_hi[tuple(c[i] + (1 if i == d else 0)
                                     for i in range(3))]
                       for c in tuvs], dtype=np.int32)
        Rd = R[..., sel]                      # (C, ntuv(L))
        out.append(jnp.einsum('m,mpqt,mt->mpq', pref, E3, Rd))
    return jnp.stack(out)


def _assemble_deriv(mol, kernel, extra=()):
    """(3, nao, nao) assembly (derivative on bra side only)."""
    from .int1e import _assemble
    return _assemble(mol, kernel, ncomp=3, extra=extra)


@on_integral_device
def int1e_ipovlp(mol):
    return _assemble_deriv(mol, ipovlp_chunk)


@on_integral_device
def int1e_ipkin(mol):
    return _assemble_deriv(mol, ipkin_chunk)


@on_integral_device
def int1e_ipnuc(mol):
    from .int1e import ATOM_PAD
    natm_pad = -(-mol.natm // ATOM_PAD) * ATOM_PAD
    coords = np.zeros((natm_pad, 3))
    coords[:mol.natm] = mol.coords
    z = np.zeros(natm_pad)
    z[:mol.natm] = mol.charges
    return _assemble_deriv(mol, ipnuc_chunk,
                           extra=(jnp.asarray(coords), jnp.asarray(z)))


@on_integral_device
def int1e_iprinv(mol, center):
    return _assemble_deriv(mol, iprinv_chunk,
                           extra=(jnp.asarray(center),))


@partial(jax.jit, static_argnums=(0, 1))
def pnucp_chunk(la, lb, a, b, A, B, w, atom_coords, atom_charges):
    """sum_d <d_d a| V_nuc |d_d b> (the spin-free pVp integral kernel)."""
    p = a + b
    P = (a[:, None] * A + b[:, None] * B) / p[:, None]
    L = la + lb + 2
    E = {}
    for da in (1, -1):
        for db in (1, -1):
            if la + da < 0 or lb + db < 0:
                continue
            E[(da, db)] = e3d(la + da, lb + db, a, b, A, B)
    PC = P[:, None, :] - atom_coords
    R = hermite_R(L, p[:, None], PC)
    RZ = jnp.einsum('mct,c->mt', R, atom_charges)
    pref = w * (2.0 * jnp.pi / p)

    def vblock(da, db, ca_idx, cb_idx):
        e3 = E[(da, db)]
        nt = e3.shape[-1]
        return -jnp.einsum('m,mt,mt->m', pref,
                           e3[:, ca_idx, cb_idx, :], RZ[:, :nt])

    carts_a = cart_components(la)
    carts_b = cart_components(lb)
    idx = {}
    for da in (1, -1):
        if la + da >= 0:
            idx[('a', da)] = {c: i for i, c in
                              enumerate(cart_components(la + da))}
    for db in (1, -1):
        if lb + db >= 0:
            idx[('b', db)] = {c: i for i, c in
                              enumerate(cart_components(lb + db))}

    rows = []
    for ca in carts_a:
        cols = []
        for cb in carts_b:
            acc = 0.0
            for d in range(3):
                terms = []
                # (2a up_a - i dn_a)(2b up_b - j dn_b)
                ua = tuple(ca[k] + (1 if k == d else 0) for k in range(3))
                ub = tuple(cb[k] + (1 if k == d else 0) for k in range(3))
                t = 4.0 * a * b * vblock(1, 1, idx[('a', 1)][ua],
                                         idx[('b', 1)][ub])
                if cb[d] >= 1:
                    db_ = tuple(cb[k] - (1 if k == d else 0) for k in range(3))
                    t = t - 2.0 * a * cb[d] * vblock(
                        1, -1, idx[('a', 1)][ua], idx[('b', -1)][db_])
                if ca[d] >= 1:
                    da_ = tuple(ca[k] - (1 if k == d else 0) for k in range(3))
                    t = t - 2.0 * b * ca[d] * vblock(
                        -1, 1, idx[('a', -1)][da_], idx[('b', 1)][ub])
                    if cb[d] >= 1:
                        t = t + ca[d] * cb[d] * vblock(
                            -1, -1, idx[('a', -1)][da_], idx[('b', -1)][db_])
                acc = acc + t
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


@on_integral_device
def int1e_pnucp(mol):
    """(nao, nao) spin-free pVp matrix."""
    from .int1e import _assemble, ATOM_PAD
    natm_pad = -(-mol.natm // ATOM_PAD) * ATOM_PAD
    coords = np.zeros((natm_pad, 3))
    coords[:mol.natm] = mol.coords
    z = np.zeros(natm_pad)
    z[:mol.natm] = mol.charges
    return _assemble(mol, pnucp_chunk,
                     extra=(jnp.asarray(coords), jnp.asarray(z)))


@partial(jax.jit, static_argnums=(0, 1))
def ipnucip_chunk(la, lb, a, b, A, B, w, atom_coords, atom_charges):
    """<d_d a| V_nuc |d_e b> for all (d, e): (9, C, nca, ncb), row-major
    over (d, e). Backs the spin-orbit pV x p integrals for spinor X2C."""
    p = a + b
    P = (a[:, None] * A + b[:, None] * B) / p[:, None]
    L = la + lb + 2
    E = {}
    for da in (1, -1):
        for db in (1, -1):
            if la + da < 0 or lb + db < 0:
                continue
            E[(da, db)] = e3d(la + da, lb + db, a, b, A, B)
    PC = P[:, None, :] - atom_coords
    R = hermite_R(L, p[:, None], PC)
    RZ = jnp.einsum('mct,c->mt', R, atom_charges)
    pref = w * (2.0 * jnp.pi / p)

    def vblock(da, db, ca_idx, cb_idx):
        e3 = E[(da, db)]
        nt = e3.shape[-1]
        return -jnp.einsum('m,mt,mt->m', pref,
                           e3[:, ca_idx, cb_idx, :], RZ[:, :nt])

    carts_a = cart_components(la)
    carts_b = cart_components(lb)
    idx = {}
    for da in (1, -1):
        if la + da >= 0:
            idx[('a', da)] = {c: i for i, c in
                              enumerate(cart_components(la + da))}
    for db in (1, -1):
        if lb + db >= 0:
            idx[('b', db)] = {c: i for i, c in
                              enumerate(cart_components(lb + db))}

    comps = []
    for d in range(3):
        for e in range(3):
            rows = []
            for ca in carts_a:
                cols = []
                for cb in carts_b:
                    ua = tuple(ca[k] + (1 if k == d else 0)
                               for k in range(3))
                    ub = tuple(cb[k] + (1 if k == e else 0)
                               for k in range(3))
                    t = 4.0 * a * b * vblock(1, 1, idx[('a', 1)][ua],
                                             idx[('b', 1)][ub])
                    if cb[e] >= 1:
                        db_ = tuple(cb[k] - (1 if k == e else 0)
                                    for k in range(3))
                        t = t - 2.0 * a * cb[e] * vblock(
                            1, -1, idx[('a', 1)][ua], idx[('b', -1)][db_])
                    if ca[d] >= 1:
                        da_ = tuple(ca[k] - (1 if k == d else 0)
                                    for k in range(3))
                        t = t - 2.0 * b * ca[d] * vblock(
                            -1, 1, idx[('a', -1)][da_], idx[('b', 1)][ub])
                        if cb[e] >= 1:
                            t = t + ca[d] * cb[e] * vblock(
                                -1, -1, idx[('a', -1)][da_],
                                idx[('b', -1)][db_])
                    cols.append(t)
                rows.append(jnp.stack(cols, axis=-1))
            comps.append(jnp.stack(rows, axis=-2))
    return jnp.stack(comps)


@on_integral_device
def int1e_ipnucip(mol):
    """(3, 3, nao, nao): <d_d mu|V_nuc|d_e nu>."""
    from .int1e import _assemble, ATOM_PAD
    natm_pad = -(-mol.natm // ATOM_PAD) * ATOM_PAD
    coords = np.zeros((natm_pad, 3))
    coords[:mol.natm] = mol.coords
    z = np.zeros(natm_pad)
    z[:mol.natm] = mol.charges
    out = _assemble(mol, ipnucip_chunk, ncomp=9,
                    extra=(jnp.asarray(coords), jnp.asarray(z)))
    return out.reshape(3, 3, mol.nao, mol.nao)


@on_integral_device
def int1e_pnucxp(mol):
    """(3, nao, nao): the spin-orbit vector (p V x p)_x = W[y,z]-W[z,y]."""
    wde = np.asarray(int1e_ipnucip(mol))
    return jnp.stack([wde[1, 2] - wde[2, 1],
                      wde[2, 0] - wde[0, 2],
                      wde[0, 1] - wde[1, 0]])
