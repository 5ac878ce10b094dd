"""Generic orbital-response (z-vector) gradients for post-HF energies.

Any correlation energy expressible as a traceable function
f(X, Co, Cv, e_occ, e_vir) of the geometry and the CANONICAL converged
SCF quantities gets an analytic nuclear gradient here WITHOUT hand-derived
density/Lagrangian algebra (the reference hand-codes those per method:
pyscf/grad/mp2.py, grad/ccsd.py, grad/lagrange.py):

  * jax.grad supplies the orbital/eigenvalue sensitivities
    a_o = df/dCo, a_v = df/dCv, b = df/de  exactly;
  * the canonical orbital responses are eliminated analytically:
      dCo = Cv U + Co(-s_oo/2 + T^oo),   U_{ai} from one z-vector CPHF,
      dCv = -Co(s_vo + U)^T + Cv(-s_vv/2 + T^vv),
      T^pq = [ (e_p+e_q)/2 s_pq - Ftot_pq ] / (e_p - e_q)   (same-block,
      antisymmetric; safe-divided — exact when f is invariant under
      rotations among degenerate canonical orbitals, which holds for any
      well-defined correlation energy),
      de_p  = Ftot_pp - s_pp e_p,
    where Ftot is the full MO Fock response including orbital relaxation;
  * every surviving first-order quantity couples to the perturbation only
    through S^x and the frozen-density Fock response F^x, so the total
    gradient collapses to ONE reverse-mode pass:
      dE/dX = d/dX [ f(X) + tr(W_F . F(X, D0)) + tr(W_S . S(X)) ]
    with constant weight matrices W_F, W_S assembled from the z-vector
    and difference-quotient densities.

The same machinery yields MP2 (f explicit in Co/Cv/e) and any amplitude
method whose energy functional is stationary in its internal amplitudes
(CC with Lambda). CPHF operator and traceable S/F builders are shared
with the analytic Hessian (hessian/rhf.py).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.device import integral_compute
from ..grad.autodiff import (_j2c, _enuc, _exc_quadrature,
                             _build_host_data_cached)
from ..hessian.rhf import _s_h_builders, _j3c_builder, _cphf_pcg

DEG_THRESH = 1e-8        # degenerate-pair cutoff for difference quotients


def _safe_quotient(num, de):
    """num/de with degenerate pairs (|de| < DEG_THRESH) zeroed."""
    ok = jnp.abs(de) > DEG_THRESH
    return jnp.where(ok, num / jnp.where(ok, de, 1.0), 0.0)


def response_gradient(mf, f_corr, extra_args=()):
    """Analytic dE_corr/dX for f_corr(X, Co, Cv, eo, ev, *extra_args).

    mf: converged DF-RHF (or global-hybrid DF-RKS) mean field.
    f_corr: traceable scalar; must be stationary w.r.t. any internal
    amplitude parameters passed through extra_args.
    Returns (e_corr, grad (natm, 3) jnp arrays).
    """
    mol = mf.mol
    if getattr(mf, 'with_df', None) is None:
        raise NotImplementedError('response gradients need density '
                                  'fitting; use mf.density_fit()')
    auxmol = mf.with_df.auxmol
    naux = auxmol.nao
    isks = hasattr(mf, 'xc')
    hyb = 1.0
    xc = None
    coords = weights = None
    if isks:
        from ..dft import xc as xc_mod
        from ..dft.numint import _pad_grid
        xc = xc_mod.parse_xc(mf.xc)
        hyb = float(mf._numint.hybrid_coeff(mf.xc))
        if mf._numint.rsh_coeff(mf.xc)[0]:
            raise NotImplementedError('range-separated hybrids')
        if mf.grids.coords is None:
            mf.grids.build()
        coords, weights = _pad_grid(mf.grids.coords, mf.grids.weights)

    pairs, auxes = _build_host_data_cached(mol, auxmol)
    s_fun, h_fun = _s_h_builders(mol, pairs)
    j3c_fun = _j3c_builder(mol, auxmol, pairs, auxes)

    def jk_mats(X, D):
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

    def fock(X, D):
        f = h_fun(X)
        vj, vk = jk_mats(X, D)
        f = f + vj - 0.5 * hyb * vk
        if isks:
            f = f + jax.grad(
                lambda Xx, Dd: _exc_quadrature(mol, xc, Xx, Dd, coords,
                                               weights, True),
                argnums=1)(X, D)
        return f

    # --- converged quantities -----------------------------------------
    X0 = jnp.asarray(np.asarray(mol.coords))
    occ = np.asarray(mf.mo_occ)
    sel = occ > 0
    C = jnp.asarray(mf.mo_coeff)
    Co, Cv = C[:, sel], C[:, ~sel]
    eo = jnp.asarray(np.asarray(mf.mo_energy)[sel])
    ev = jnp.asarray(np.asarray(mf.mo_energy)[~sel])
    no, nv = Co.shape[1], Cv.shape[1]
    D0 = 2.0 * Co @ Co.T

    # --- autodiff sensitivities ---------------------------------------
    e_corr, (a_o, a_v, b_o, b_v) = jax.value_and_grad(
        f_corr, argnums=(1, 2, 3, 4))(X0, Co, Cv, eo, ev, *extra_args)

    Po = Co.T @ a_o          # (no, no): coefficient of Theta^oo
    Pv = Cv.T @ a_v          # (nv, nv)
    Q = Cv.T @ a_o           # (nv, no): direct U coefficient
    R = Co.T @ a_v           # (no, nv)

    # difference-quotient densities (classic Doo/Dvv without hand algebra)
    Pa_o = 0.5 * (Po - Po.T)
    Pa_v = 0.5 * (Pv - Pv.T)
    Doo = _safe_quotient(Pa_o, eo[:, None] - eo[None, :])   # symmetric
    Dvv = _safe_quotient(Pa_v, ev[:, None] - ev[None, :])

    # MO weight of the full Fock response Ftot: Gamma
    G_oo = -Doo + jnp.diag(b_o)
    G_vv = -Dvv + jnp.diag(b_v)
    Gamma_ao = Co @ G_oo @ Co.T + Cv @ G_vv @ Cv.T

    # --- CPHF operator (shared with hessian/rhf.py) ---------------------
    _, lin_g = jax.linearize(lambda d: fock(X0, d), D0)
    gT = jax.linear_transpose(lin_g, D0)

    def g_adj(M):
        """Adjoint of the Fock-response linearization: G*(M)."""
        return gT(M)[0]

    def dD_of_u(u):                                    # u (nv, no)
        half = Cv @ u @ Co.T
        return 2.0 * (half + half.T)

    ediff = ev[:, None] - eo[None, :]

    def matvec(u):                                     # u (nv, no, 1)
        g = lin_g(dD_of_u(u[:, :, 0]))
        g_vo = Cv.T @ g @ Co
        return ediff[:, :, None] * u + g_vo[:, :, None]

    # U coefficient q: direct terms + Gamma coupling through G[dD(U)]
    Mg = g_adj(Gamma_ao)
    q = Q - R.T + 2.0 * (Cv.T @ (Mg + Mg.T) @ Co)
    z, res = _cphf_pcg(matvec, q[:, :, None], ediff)
    z = z[:, :, 0]

    # --- constant weight matrices ---------------------------------------
    # W_F (MO): contracts with MO(F^x, frozen D0)
    WF = (Co @ G_oo @ Co.T + Cv @ G_vv @ Cv.T
          - Cv @ z @ Co.T)                     # vo block weight -z
    # W_S (MO blocks): contracts with s^x = C^T S^x C
    eps_oo = 0.5 * (eo[:, None] + eo[None, :])
    eps_vv = 0.5 * (ev[:, None] + ev[None, :])
    Zao = Cv @ z @ Co.T
    Madj = g_adj(Zao) + g_adj(Zao.T)           # G is self-adjoint-applied
    WS_oo = (-0.5 * Po + Doo * eps_oo - jnp.diag(b_o * eo)
             + Co.T @ (g_adj(Zao) + g_adj(Zao).T) @ Co
             - 2.0 * Co.T @ Mg @ Co)
    WS_vv = -0.5 * Pv + Dvv * eps_vv - jnp.diag(b_v * ev)
    WS_vo = -R.T + z * eo[None, :]
    WS = (Co @ WS_oo @ Co.T + Cv @ WS_vv @ Cv.T + Cv @ WS_vo @ Co.T)

    # --- one reverse-mode pass over the geometry ------------------------
    def total(X):
        return (f_corr(X, Co, Cv, eo, ev, *extra_args)
                + jnp.sum(WF * fock(X, D0))
                + jnp.sum(WS * s_fun(X)))

    grad = jax.grad(total)(X0)
    return e_corr, grad


def make_df_mo_eri_fn(mf):
    """Traceable X -> B_ov (naux, no, nv): the DF MO factor, for building
    correlation energies as functions of geometry."""
    mol = mf.mol
    auxmol = mf.with_df.auxmol
    naux = auxmol.nao
    pairs, auxes = _build_host_data_cached(mol, auxmol)
    j3c_fun = _j3c_builder(mol, auxmol, pairs, auxes)
    nao = mol.nao

    def bov(X, Co, Cv):
        j3 = j3c_fun(X)
        j2 = _j2c(auxes, naux, X)
        L = jnp.linalg.cholesky(j2)
        B = jax.scipy.linalg.solve_triangular(
            L, j3.reshape(nao * nao, naux).T, lower=True)
        B = B.reshape(naux, nao, nao)
        return jnp.einsum('pmn,mi,na->pia', B, Co, Cv)

    return bov
