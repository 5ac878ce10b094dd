"""Analytic nuclear Hessian for DF-RHF/RKS via coupled-perturbed SCF.

Analog of reference pyscf/hessian/rhf.py (partial_hess_elec + solve_mo1 CPHF
loop) and pyscf/hessian/rks.py, re-derived autodiff-first for TPU:

  H[t, :] = d/dX_t [ dE/dX ] = jvp of the *stationary* analytic gradient
            g(X, D, W) = grad_X E_fix(X, D, W)
            along the tangent (dX_t, dD_t, dW_t),

where E_fix holds the density matrix D and energy-weighted density W fixed
(so g is the exact first derivative by Hellmann-Feynman + Pulay), and the
density/W responses (dD_t, dW_t) come from first-order perturbation theory:
CPHF in the occupied-virtual block, with the orbital-rotation response
operator G[dD] obtained as the *linearization* (jax.linearize) of the
Fock build D -> F(X0, D).  For KS functionals that linearization
automatically contains fxc (second derivative of the XC energy density by
autodiff) — no hand-coded XC kernels, unlike the reference's
hessian/rks.py + libxc fxc tables.

Everything reduces to three traceable primitives of the geometry X:
S(X), hcore(X) and the DF Fock build F(X, D); their jvps replace the
reference's int1e_ip*/int2e_ip1ip2 derivative-integral C kernels.

Becke grid points/weights are held fixed (no grid response), matching the
reference default; use dense grids for tight FD agreement.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.device import integral_compute
from ..ops.integrals.int2e import _eri_core
from ..ops.integrals.int1e import (ovlp_chunk, kin_chunk, nuc_chunk,
                                   ATOM_PAD)
from ..ops.integrals.hermite import n_tuv
from ..grad.autodiff import (_GradPairs, _AuxData, _j2c, _enuc,
                             _exc_quadrature, _build_host_data_cached)


# ---------------------------------------------------------------------------
# traceable full-matrix integral builders (functions of the geometry X)
# ---------------------------------------------------------------------------

def _s_h_builders(mol, pairs):
    """Traceable X -> S(nao,nao) and X -> hcore(nao,nao)."""
    nao = mol.nao
    natm = mol.natm
    natm_pad = -(-natm // ATOM_PAD) * ATOM_PAD
    Z = jnp.asarray(np.asarray(mol.charges, dtype=np.float64))

    def _assemble(X, want_h):
        Xpad = jnp.zeros((natm_pad, 3)).at[:natm].set(X)
        Zpad = jnp.zeros(natm_pad).at[:natm].set(Z)
        out = jnp.zeros((nao, nao))
        for sp in pairs:
            a, b, A, B, w = sp.flat_prims(X)
            if want_h:
                blk = kin_chunk(sp.la, sp.lb, a, b, A, B, w) \
                    + nuc_chunk(sp.la, sp.lb, a, b, A, B, w, Xpad, Zpad)
            else:
                blk = ovlp_chunk(sp.la, sp.lb, a, b, A, B, w)
            blk = blk.reshape(sp.nsel, sp.KK, sp.nca, sp.ncb).sum(axis=1)
            blk = jnp.einsum('mp,nq,spq->smn', sp.Sa, sp.Sb, blk)
            ia = jnp.asarray(sp.ia)
            jb = jnp.asarray(sp.jb)
            out = out.at[ia[:, :, None], jb[:, None, :]].set(blk)
            out = out.at[jb[:, None, :], ia[:, :, None]].set(blk)
        return out

    return (lambda X: _assemble(X, False)), (lambda X: _assemble(X, True))


def _j3c_builder(mol, auxmol, pairs, auxes):
    """Traceable X -> (nao, nao, naux) 3-center integral tensor."""
    nao, naux = mol.nao, auxmol.nao

    def j3c(X):
        out = jnp.zeros((nao, nao, naux))
        aux_cache = {ax.l: ax.data(X) for ax in auxes}
        for sp in pairs:
            p1, P1, E1 = sp.pair_data(X)
            ia = jnp.asarray(sp.ia)
            jb = jnp.asarray(sp.jb)
            for ax in auxes:
                px, Px, Ex = aux_cache[ax.l]
                blk = _eri_core(sp.la + sp.lb, ax.l, E1.shape[2],
                                n_tuv(ax.l), p1, P1, E1, px, Px, Ex)
                blk = blk.reshape(sp.nsel, sp.KK, sp.nca, sp.ncb,
                                  ax.ns, ax.K, ax.nc).sum(axis=(1, 5))
                blk = jnp.einsum('mp,nq,er,spqxr->smnxe',
                                 sp.Sa, sp.Sb, ax.Sx, blk)
                blk = blk.reshape(sp.nsel, ia.shape[1], jb.shape[1], -1)
                cols = ax.cols
                out = out.at[ia[:, :, None, None], jb[:, None, :, None],
                             cols[None, None, None, :]].set(blk)
                out = out.at[jb[:, :, None, None], ia[:, None, :, None],
                             cols[None, None, None, :]].set(
                    blk.transpose(0, 2, 1, 3))
        return out

    return j3c


# ---------------------------------------------------------------------------
# batched preconditioned CG for the CPHF equations
# ---------------------------------------------------------------------------

def _cphf_pcg(matvec, rhs, ediff, max_cycle=40, tol=1e-10):
    """Solve A u = rhs for each column of rhs (nv, no, T).

    A u = ediff*u + G_vo[dD(u)] is symmetric positive definite for a
    stable SCF solution; ediff (nv, no) is the Jacobi preconditioner
    (reference scf/cphf.py solve / krylov)."""
    pre = 1.0 / ediff[:, :, None]

    def dots(x, y):
        return jnp.einsum('aiT,aiT->T', x, y)

    x = rhs * pre
    r = rhs - matvec(x)
    z = r * pre
    p = z
    rz = dots(r, z)

    def body(k, st):
        x, r, p, rz = st
        Ap = matvec(p)
        pAp = dots(p, Ap)
        alive = jnp.sqrt(dots(r, r)) > tol
        alpha = jnp.where(alive, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        x = x + alpha[None, None, :] * p
        r = r - alpha[None, None, :] * Ap
        z = r * pre
        rz_new = dots(r, z)
        beta = jnp.where(alive, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p = z + beta[None, None, :] * p
        return (x, r, p, rz_new)

    x, r, _, _ = jax.lax.fori_loop(0, max_cycle, body, (x, r, p, rz))
    return x, jnp.sqrt(dots(r, r))


# ---------------------------------------------------------------------------
# the Hessian driver
# ---------------------------------------------------------------------------

class Hessian:
    """Analytic Hessian of a converged DF-RHF or DF-RKS (global hybrid)
    mean field.  h = Hessian(mf).kernel() -> (natm, 3, natm, 3)."""

    cphf_max_cycle = 40
    cphf_tol = 1e-9
    tangent_chunk = 6       # jvp columns evaluated per dispatch

    def __init__(self, mf):
        if getattr(mf, 'with_df', None) is None:
            raise NotImplementedError('analytic Hessian needs density '
                                      'fitting; use mf.density_fit()')
        if mf._fused_kind != 'restricted':
            raise NotImplementedError('restricted (RHF/RKS) only')
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
            self.de = np.asarray(_hessian(self.mf, self.cphf_max_cycle,
                                          self.cphf_tol, self.tangent_chunk))
        return self.de


def _hessian(mf, cphf_max_cycle, cphf_tol, tangent_chunk):
    mol = mf.mol
    auxmol = mf.with_df.auxmol
    naux = auxmol.nao
    natm = mol.natm
    nt = 3 * natm

    isks = hasattr(mf, 'xc')
    hyb = 0.0
    xc = None
    coords = weights = None
    if isks:
        from ..dft import xc as xc_mod
        from ..dft.numint import _pad_grid
        xc = xc_mod.parse_xc(mf.xc)
        hyb = float(mf._numint.hybrid_coeff(mf.xc))
        omega = mf._numint.rsh_coeff(mf.xc)[0] if hasattr(
            mf._numint, 'rsh_coeff') else 0.0
        if omega:
            raise NotImplementedError('range-separated hybrids')
        if mf.grids.coords is None:
            mf.grids.build()
        coords, weights = _pad_grid(mf.grids.coords, mf.grids.weights)
    else:
        hyb = 1.0

    pairs, auxes = _build_host_data_cached(mol, auxmol)
    s_fun, h_fun = _s_h_builders(mol, pairs)
    j3c_fun = _j3c_builder(mol, auxmol, pairs, auxes)
    Z = jnp.asarray(np.asarray(mol.charges, dtype=np.float64))

    def jk_mats(X, D):
        """(vj, vk) from the traceable DF factorization."""
        j3 = j3c_fun(X)
        j2 = _j2c(auxes, naux, X)
        L = jnp.linalg.cholesky(j2)
        nao = D.shape[0]
        B = jax.scipy.linalg.solve_triangular(
            L, j3.reshape(nao * nao, naux).T, lower=True)
        B = B.reshape(naux, nao, nao)
        gam = jnp.einsum('pij,ji->p', B, D)
        vj = jnp.einsum('p,pij->ij', gam, B)
        BD = jnp.einsum('pik,kl->pil', B, D)
        vk = jnp.einsum('pil,plj->ij', BD, B)
        return vj, vk

    def exc_fun(X, D):
        return _exc_quadrature(mol, xc, X, D, coords, weights, True)

    def fock(X, D):
        """Full Fock matrix h + J - (hyb/2) K + Vxc, traceable in X and D."""
        f = h_fun(X)
        vj, vk = jk_mats(X, D)
        f = f + vj - 0.5 * hyb * vk
        if isks:
            # Vxc_ij = dExc/dD_ij (symmetric): equals the numint vmat
            f = f + jax.grad(exc_fun, argnums=1)(X, D)
        return f

    def e_fix(X, D, W):
        """Total energy with D and W held fixed (the stationary form whose
        grad_X is the exact analytic gradient, grad/autodiff.py)."""
        e = _enuc(X, Z) + jnp.sum(D * h_fun(X)) - jnp.sum(W * s_fun(X))
        vj, vk = jk_mats(X, D)
        e = e + 0.5 * jnp.sum(vj * D) - 0.25 * hyb * jnp.sum(vk * D)
        if isks:
            e = e + exc_fun(X, D)
        return e

    g_fun = jax.grad(e_fix, argnums=0)

    # --- converged SCF data -------------------------------------------
    X0 = jnp.asarray(np.asarray(mol.coords))
    occ = np.asarray(mf.mo_occ)
    sel = occ > 0
    C = jnp.asarray(mf.mo_coeff)
    Co = C[:, sel]
    Cv = C[:, ~sel]
    eo = jnp.asarray(np.asarray(mf.mo_energy)[sel])
    ev = jnp.asarray(np.asarray(mf.mo_energy)[~sel])
    no, nv = Co.shape[1], Cv.shape[1]
    D0 = 2.0 * Co @ Co.T
    W0 = 2.0 * (Co * eo[None, :]) @ Co.T

    tangents = jnp.eye(nt).reshape(nt, natm, 3)

    def _chunked_jvp(f, primal, extra=None):
        """jvp of f along every coordinate tangent, chunked: (nt, ...)."""
        outs = []
        if extra is None:
            fx = f
        else:
            fx = lambda X: f(X, *extra)
        jv = jax.jit(jax.vmap(
            lambda t: jax.jvp(fx, (primal,), (t,))[1]))
        for i0 in range(0, nt, tangent_chunk):
            outs.append(jv(tangents[i0:i0 + tangent_chunk]))
        return jnp.concatenate(outs, axis=0)

    # first-order integral responses (the reference's int1e_ip*/int2e_ip1
    # derivative integrals, produced here by forward-mode AD)
    S1 = _chunked_jvp(s_fun, X0)                      # (nt, nao, nao)
    F1 = _chunked_jvp(fock, X0, extra=(D0,))          # frozen-D Fock resp.

    # MO transforms
    s1_oo = jnp.einsum('mi,tmn,nj->tij', Co, S1, Co)
    s1_vo = jnp.einsum('ma,tmn,ni->tai', Cv, S1, Co)
    f1_vo = jnp.einsum('ma,tmn,ni->tai', Cv, F1, Co)

    # linearized Fock response in D at the solution (contains J, K and fxc)
    _, lin_g = jax.linearize(lambda d: fock(X0, d), D0)
    lin_g_batch = jax.jit(jax.vmap(lin_g))

    def dD_of_u(u):                                   # u (nv, no, T)
        half = jnp.einsum('ma,aiT,ni->Tmn', Cv, u, Co)
        return 2.0 * (half + half.transpose(0, 2, 1))

    ediff = ev[:, None] - eo[None, :]

    @jax.jit
    def matvec(u):
        g = lin_g_batch(dD_of_u(u))
        g_vo = jnp.einsum('ma,Tmn,ni->aiT', Cv, g, Co)
        return ediff[:, :, None] * u + g_vo

    # RHS: (ea-ei) u_ai + G_ai[dD(u)] = -f1_ai + G_ai[2 Co s1_oo Co^T]
    #      + s1_ai e_i        (see module docstring derivation)
    dD_oo = -2.0 * jnp.einsum('mi,tij,nj->tmn', Co, s1_oo, Co)
    g_oo = lin_g_batch(dD_oo)
    g_oo_vo = jnp.einsum('ma,tmn,ni->ait', Cv, g_oo, Co)
    rhs = (-f1_vo.transpose(1, 2, 0) - g_oo_vo
           + s1_vo.transpose(1, 2, 0) * eo[None, :, None])

    U, res = _cphf_pcg(matvec, rhs, ediff, cphf_max_cycle, cphf_tol)

    # density and energy-weighted-density responses
    dD = dD_of_u(U) + dD_oo                           # (nt, nao, nao)
    f1tot = F1 + lin_g_batch(dD)
    f1_oo = jnp.einsum('mi,tmn,nj->tij', Co, f1tot, Co)
    # dC_occ = Cv U - (1/2) Co s1_oo
    dCo = (jnp.einsum('ma,aiT->Tmi', Cv, U)
           - 0.5 * jnp.einsum('mj,tji->tmi', Co, s1_oo))
    # de_i = f1tot_ii - s1_ii e_i
    de_occ = (jnp.einsum('tii->ti', f1_oo)
              - jnp.einsum('tii->ti', s1_oo) * eo[None, :])
    dW = 2.0 * (jnp.einsum('tmi,i,ni->tmn', dCo, eo, Co)
                + jnp.einsum('mi,i,tni->tmn', Co, eo, dCo)
                + jnp.einsum('mi,ti,ni->tmn', Co, de_occ, Co))

    # Hessian rows: jvp of the analytic gradient along (dX, dD, dW)
    jv_rows = jax.jit(jax.vmap(
        lambda tx, td, tw: jax.jvp(g_fun, (X0, D0, W0), (tx, td, tw))[1]))
    rows = []
    for i0 in range(0, nt, max(1, tangent_chunk // 2)):
        i1 = min(i0 + max(1, tangent_chunk // 2), nt)
        rows.append(jv_rows(tangents[i0:i1], dD[i0:i1], dW[i0:i1]))
    H = jnp.concatenate(rows, axis=0).reshape(nt, nt)
    H = 0.5 * (H + H.T)
    return H.reshape(natm, 3, natm, 3)
