"""Analytic nuclear Hessian for DF-UHF/UKS via spin-coupled CPHF.

Analog of reference pyscf/hessian/uhf.py + uks.py (partial_hess_elec +
solve_mo1 over the two spin channels), re-derived autodiff-first exactly
like the restricted version (hessian/rhf.py here):

  H[t, :] = jvp of the stationary analytic gradient
            g(X, D, W) = grad_X E_fix(X, D, W)
  along the tangent (dX_t, dD_t, dW_t),

with D = (D_alpha, D_beta) stacked, W the *total* energy-weighted density
(S is spin-independent), and the first-order responses from one
spin-coupled CPHF solve: the alpha and beta rotation amplitudes couple
through J and through f_xc (produced automatically as the linearization
of the unrestricted Fock build D -> F(X0, D); the reference needs the
hand-threaded libxc u-fxc tables for this).

Becke grid points/weights are held fixed (no grid response), matching
the reference default.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.device import integral_compute
from ..grad.autodiff import (_j2c, _enuc, _exc_quadrature,
                             _build_host_data_cached)
from .rhf import _s_h_builders, _j3c_builder


def _pcg_flat(matvec, rhs, pre, max_cycle=40, tol=1e-10):
    """Preconditioned CG on flat (N, T) column systems."""
    dots = lambda x, y: jnp.einsum('nT,nT->T', x, y)
    x = rhs * pre[:, None]
    r = rhs - matvec(x)
    z = r * pre[:, None]
    p = z
    rz = dots(r, z)

    def body(k, st):
        x, r, p, rz = st
        Ap = matvec(p)
        pAp = dots(p, Ap)
        alive = jnp.sqrt(dots(r, r)) > tol
        alpha = jnp.where(alive, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * Ap
        z = r * pre[:, None]
        rz_new = dots(r, z)
        beta = jnp.where(alive, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p = z + beta[None, :] * p
        return (x, r, p, rz_new)

    x, r, _, _ = jax.lax.fori_loop(0, max_cycle, body, (x, r, p, rz))
    return x, jnp.sqrt(dots(r, r))


class Hessian:
    """Analytic Hessian of a converged DF-UHF or DF-UKS (global hybrid
    or pure) mean field.  h = Hessian(mf).kernel() -> (natm,3,natm,3)."""

    cphf_max_cycle = 50
    cphf_tol = 1e-9
    tangent_chunk = 6

    def __init__(self, mf):
        if getattr(mf, 'with_df', None) is None:
            raise NotImplementedError('analytic Hessian needs density '
                                      'fitting; use mf.density_fit()')
        if mf._fused_kind != 'unrestricted':
            raise NotImplementedError('unrestricted (UHF/UKS) only')
        if hasattr(mf, 'xc'):
            if mf._numint.rsh_coeff(mf.xc)[0]:
                raise NotImplementedError('range-separated hybrids')
            if getattr(mf, 'nlc', ''):
                raise NotImplementedError('NLC functionals')
        self.mf = mf
        self.mol = mf.mol
        self.de = None

    def kernel(self):
        with integral_compute():
            self.de = np.asarray(_uhessian(self.mf, self.cphf_max_cycle,
                                           self.cphf_tol,
                                           self.tangent_chunk))
        return self.de

    run = kernel


def _uhessian(mf, cphf_max_cycle, cphf_tol, tangent_chunk):
    mol = mf.mol
    auxmol = mf.with_df.auxmol
    naux = auxmol.nao
    natm = mol.natm
    nt = 3 * natm

    isks = hasattr(mf, 'xc')
    xc = None
    coords = weights = None
    if isks:
        from ..dft import xc as xc_mod
        from ..dft.numint import _pad_grid
        xc = xc_mod.parse_xc(mf.xc)
        hyb = float(mf._numint.hybrid_coeff(mf.xc))
        if mf.grids.coords is None:
            mf.grids.build()
        coords, weights = _pad_grid(mf.grids.coords, mf.grids.weights)
    else:
        hyb = 1.0

    pairs, auxes = _build_host_data_cached(mol, auxmol)
    s_fun, h_fun = _s_h_builders(mol, pairs)
    j3c_fun = _j3c_builder(mol, auxmol, pairs, auxes)
    Z = jnp.asarray(np.asarray(mol.charges, dtype=np.float64))
    nao = mol.nao

    def jk_mats(X, D):
        """vj (nao,nao) of the total density + per-spin vk (2,nao,nao)."""
        j3 = j3c_fun(X)
        j2 = _j2c(auxes, naux, X)
        L = jnp.linalg.cholesky(j2)
        B = jax.scipy.linalg.solve_triangular(
            L, j3.reshape(nao * nao, naux).T, lower=True)
        B = B.reshape(naux, nao, nao)
        dtot = D[0] + D[1]
        gam = jnp.einsum('pij,ji->p', B, dtot)
        vj = jnp.einsum('p,pij->ij', gam, B)
        vk = jnp.stack([
            jnp.einsum('pik,kl,plj->ij', B, D[s], B) for s in (0, 1)])
        return vj, vk

    def exc_fun(X, D):
        return _exc_quadrature(mol, xc, X, D, coords, weights, False)

    def fock(X, D):
        """Spin-resolved Fock (2,nao,nao), traceable in X and D."""
        f0 = h_fun(X)
        vj, vk = jk_mats(X, D)
        f = f0[None] + vj[None] - hyb * vk
        if isks:
            f = f + jax.grad(exc_fun, argnums=1)(X, D)
        return f

    def e_fix(X, D, W):
        dtot = D[0] + D[1]
        e = _enuc(X, Z) + jnp.sum(dtot * h_fun(X)) - jnp.sum(W * s_fun(X))
        vj, vk = jk_mats(X, D)
        e = e + 0.5 * jnp.sum(vj * dtot) \
            - 0.5 * hyb * (jnp.sum(vk[0] * D[0]) + jnp.sum(vk[1] * D[1]))
        if isks:
            e = e + exc_fun(X, D)
        return e

    g_fun = jax.grad(e_fix, argnums=0)

    # --- converged SCF data per spin ----------------------------------
    X0 = jnp.asarray(np.asarray(mol.coords))
    occ = np.asarray(mf.mo_occ)
    C = np.asarray(mf.mo_coeff)
    E = np.asarray(mf.mo_energy)
    Co, Cv, eo, ev, no, nv = [], [], [], [], [], []
    for s in range(2):
        sel = occ[s] > 0
        Co.append(jnp.asarray(C[s][:, sel]))
        Cv.append(jnp.asarray(C[s][:, ~sel]))
        eo.append(jnp.asarray(E[s][sel]))
        ev.append(jnp.asarray(E[s][~sel]))
        no.append(int(sel.sum()))
        nv.append(int((~sel).sum()))
    D0 = jnp.stack([Co[s] @ Co[s].T for s in range(2)])
    W0 = sum((Co[s] * eo[s][None, :]) @ Co[s].T for s in range(2))

    tangents = jnp.eye(nt).reshape(nt, natm, 3)

    def _chunked_jvp(f, primal, extra=None):
        fx = f if extra is None else (lambda X: f(X, *extra))
        jv = jax.jit(jax.vmap(
            lambda t: jax.jvp(fx, (primal,), (t,))[1]))
        outs = []
        for i0 in range(0, nt, tangent_chunk):
            outs.append(jv(tangents[i0:i0 + tangent_chunk]))
        return jnp.concatenate(outs, axis=0)

    S1 = _chunked_jvp(s_fun, X0)                       # (nt, nao, nao)
    F1 = _chunked_jvp(fock, X0, extra=(D0,))           # (nt, 2, nao, nao)

    s1_oo = [jnp.einsum('mi,tmn,nj->tij', Co[s], S1, Co[s])
             for s in range(2)]
    s1_vo = [jnp.einsum('ma,tmn,ni->tai', Cv[s], S1, Co[s])
             for s in range(2)]
    f1_vo = [jnp.einsum('ma,tmn,ni->tai', Cv[s], F1[:, s], Co[s])
             for s in range(2)]

    # linearized spin-coupled Fock response (J + K + u-fxc)
    _, lin_g = jax.linearize(lambda d: fock(X0, d), D0)
    lin_g_batch = jax.jit(jax.vmap(lin_g))

    sizes = [nv[s] * no[s] for s in range(2)]

    def split_u(u):
        ua = u[:sizes[0]].reshape(nv[0], no[0], -1)
        ub = u[sizes[0]:].reshape(nv[1], no[1], -1)
        return ua, ub

    def dD_of_u(u):
        us = split_u(u)
        ds = []
        for s in range(2):
            half = jnp.einsum('ma,aiT,ni->Tmn', Cv[s], us[s], Co[s])
            ds.append(half + half.transpose(0, 2, 1))
        return jnp.stack(ds, axis=1)                   # (T, 2, nao, nao)

    ediff_flat = jnp.concatenate([
        (ev[s][:, None] - eo[s][None, :]).reshape(-1) for s in range(2)])

    @jax.jit
    def matvec(u):
        g = lin_g_batch(dD_of_u(u))                    # (T, 2, nao, nao)
        parts = []
        for s in range(2):
            gvo = jnp.einsum('ma,Tmn,ni->aiT', Cv[s], g[:, s], Co[s])
            parts.append(gvo.reshape(sizes[s], -1))
        return ediff_flat[:, None] * u + jnp.concatenate(parts, axis=0)

    # occupied-occupied frozen response from the overlap derivative
    dD_oo = jnp.stack([
        -jnp.einsum('mi,tij,nj->tmn', Co[s], s1_oo[s], Co[s])
        for s in range(2)], axis=1)                    # (nt, 2, nao, nao)
    g_oo = lin_g_batch(dD_oo)
    rhs_parts = []
    for s in range(2):
        g_oo_vo = jnp.einsum('ma,tmn,ni->ait', Cv[s], g_oo[:, s], Co[s])
        rhs_s = (-f1_vo[s].transpose(1, 2, 0) - g_oo_vo
                 + s1_vo[s].transpose(1, 2, 0) * eo[s][None, :, None])
        rhs_parts.append(rhs_s.reshape(sizes[s], -1))
    rhs = jnp.concatenate(rhs_parts, axis=0)           # (N, nt)

    U, _res = _pcg_flat(matvec, rhs, 1.0 / ediff_flat,
                        cphf_max_cycle, cphf_tol)

    dD = dD_of_u(U) + dD_oo                            # (nt, 2, nao, nao)
    f1tot = F1 + lin_g_batch(dD)
    Us = split_u(U)
    dW = 0.0
    for s in range(2):
        f1_oo = jnp.einsum('mi,tmn,nj->tij', Co[s], f1tot[:, s], Co[s])
        dCo = (jnp.einsum('ma,aiT->Tmi', Cv[s], Us[s])
               - 0.5 * jnp.einsum('mj,tji->tmi', Co[s], s1_oo[s]))
        de_occ = (jnp.einsum('tii->ti', f1_oo)
                  - jnp.einsum('tii->ti', s1_oo[s]) * eo[s][None, :])
        dW = dW + (jnp.einsum('tmi,i,ni->tmn', dCo, eo[s], Co[s])
                   + jnp.einsum('mi,i,tni->tmn', Co[s], eo[s], dCo)
                   + jnp.einsum('mi,ti,ni->tmn', Co[s], de_occ, Co[s]))

    jv_rows = jax.jit(jax.vmap(
        lambda tx, td, tw: jax.jvp(g_fun, (X0, D0, W0), (tx, td, tw))[1]))
    rows = []
    step = max(1, tangent_chunk // 2)
    for i0 in range(0, nt, step):
        i1 = min(i0 + step, nt)
        rows.append(jv_rows(tangents[i0:i1], dD[i0:i1], dW[i0:i1]))
    H = jnp.concatenate(rows, axis=0).reshape(nt, nt)
    H = 0.5 * (H + H.T)
    return H.reshape(natm, 3, natm, 3)
