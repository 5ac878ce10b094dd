"""Analytic excited-state nuclear gradients for TDA / TDHF (RPA).

Analog of the reference's pyscf/grad/tdrhf.py + grad/tdrks.py (hand-coded
z-vector Lagrangians). Here the excitation energy is written as a
stationary Rayleigh functional of the converged eigenvectors,

  TDA : w(x) = x.A(X, Co, Cv, e).x / x.x
  RPA : w(x,y) = (x.A.x + y.A.y + 2 x.B.y) / (x.x - y.y)

with A/B built traceably from the geometry (DF 3c factors + the XC
kernel as a second derivative of the XC quadrature), so the generic
orbital-response machinery (grad/response.py) delivers the gradient of
w with ONE z-vector CPHF and one reverse-mode pass — no per-method
density/Lagrangian algebra. Total excited-state gradient = ground-state
SCF gradient + grad(w).

Requires a DF mean field (RHF or global-hybrid RKS; LDA/GGA kernels).
"""
import numpy as np
import jax
import jax.numpy as jnp

from .response import response_gradient, _build_host_data_cached
from ..hessian.rhf import _j3c_builder
from ..grad.autodiff import _j2c, _exc_quadrature


def _make_bmo_fn(mf):
    """Traceable X -> B (naux, nao, nao) whitened DF factor."""
    mol = mf.mol
    auxmol = mf.with_df.auxmol
    naux = auxmol.nao
    pairs, auxes = _build_host_data_cached(mol, auxmol)
    j3c_fun = _j3c_builder(mol, auxmol, pairs, auxes)
    nao = mol.nao

    def bfun(X):
        j3 = j3c_fun(X)
        j2 = _j2c(auxes, naux, X)
        L = jnp.linalg.cholesky(j2)
        B = jax.scipy.linalg.solve_triangular(
            L, j3.reshape(nao * nao, naux).T, lower=True)
        return B.reshape(naux, nao, nao)

    return bfun


def _omega_functional(mf, singlet, rpa=False):
    """Returns f(X, Co, Cv, eo, ev, x[, y]) -> excitation energy.

    Stationary in x (and y) at the converged TDA/RPA solution, so it
    plugs straight into response_gradient."""
    bfun = _make_bmo_fn(mf)
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

    def kernel_xc(X, D0, dD):
        """x.fxc.x along the (AO) transition density dD.

        singlet: both spin densities breathe together -> second
        derivative of the closed-shell Exc along the total density.
        triplet: spin densities move oppositely -> unrestricted Exc
        along (+dD/2, -dD/2)."""
        if singlet:
            def g(lam):
                return _exc_quadrature(mol := mf.mol, xc, X, D0 + lam * dD,
                                       coords, weights, True)
            return jax.grad(jax.grad(g))(0.0)

        def g(lam):
            dm = jnp.stack([0.5 * D0 + 0.5 * lam * dD,
                            0.5 * D0 - 0.5 * lam * dD])
            return _exc_quadrature(mf.mol, xc, X, dm, coords, weights,
                                   False)
        return jax.grad(jax.grad(g))(0.0)

    def quad_forms(X, Co, Cv, eo, ev, v):
        """(v.A_diag.v, coulomb(v,v), exchange(v,v), xc(v,v)) pieces and
        the cross terms needed by RPA, via closures over B(X)."""
        B = bfun(X)
        Bo = jnp.einsum('pmn,mi->pin', B, Co)
        Bov = jnp.einsum('pin,na->pia', Bo, Cv)
        Boo = jnp.einsum('pin,nj->pij', Bo, Co)
        Bvv = jnp.einsum('pmn,ma,nb->pab', B, Cv, Cv)
        return Bov, Boo, Bvv

    def f_tda(X, Co, Cv, eo, ev, x):
        Bov, Boo, Bvv = quad_forms(X, Co, Cv, eo, ev, x)
        nrm = jnp.sum(x * x)
        w = jnp.sum(x * x * (ev[None, :] - eo[:, None]))
        g = jnp.einsum('pia,ia->p', Bov, x)
        if singlet:
            w = w + 2.0 * jnp.sum(g * g)
        if hyb != 0.0:
            xBx = jnp.einsum('ia,pij,pab,jb->', x, Boo, Bvv, x)
            w = w - hyb * xBx
        if isks:
            half = Co @ x @ Cv.T
            dD = half + half.T
            D0 = 2.0 * Co @ Co.T
            w = w + 0.5 * kernel_xc(X, D0, dD)
        return w / nrm

    if not rpa:
        return f_tda

    def f_rpa(X, Co, Cv, eo, ev, x, y):
        Bov, Boo, Bvv = quad_forms(X, Co, Cv, eo, ev, x)
        D0 = 2.0 * Co @ Co.T

        def a_form(u, v):
            w = jnp.sum(u * v * (ev[None, :] - eo[:, None]))
            if singlet:
                w = w + 2.0 * (jnp.einsum('pia,ia->p', Bov, u)
                               @ jnp.einsum('pia,ia->p', Bov, v))
            if hyb != 0.0:
                w = w - hyb * jnp.einsum('ia,pij,pab,jb->', u, Boo, Bvv, v)
            return w

        def b_form(u, v):
            w = 0.0
            if singlet:
                w = w + 2.0 * (jnp.einsum('pia,ia->p', Bov, u)
                               @ jnp.einsum('pia,ia->p', Bov, v))
            if hyb != 0.0:
                w = w - hyb * jnp.einsum('ia,pib,pja,jb->', u, Bov, Bov, v)
            return w

        num = a_form(x, x) + a_form(y, y) + 2.0 * b_form(x, y)
        if isks:
            halfx = Co @ (x + y) @ Cv.T
            dD = halfx + halfx.T
            # A+B kernel coupling: fxc enters through (x+y) only
            num = num + 0.5 * kernel_xc(X, D0, dD)
        den = jnp.sum(x * x) - jnp.sum(y * y)
        return num / den

    return f_rpa


class Gradients:
    """td.Gradients(): analytic gradient of E_SCF + omega_state."""

    def __init__(self, td, state=1):
        self.td = td
        self._scf = td._scf
        self.mol = td.mol
        self.state = state

    def kernel(self, state=None):
        state = state or self.state
        td = self.td
        mf = self._scf
        if td.e is None:
            td.kernel()
        # ground-state gradient
        g0 = jnp.asarray(mf.nuc_grad_method().kernel())
        xy = td.xy[state - 1]
        singlet = getattr(td, 'singlet', True)
        rpa = not np.isscalar(xy[1]) and np.asarray(xy[1]).ndim == 2
        if rpa:
            f = _omega_functional(mf, singlet, rpa=True)
            x = jnp.asarray(np.asarray(xy[0]))
            y = jnp.asarray(np.asarray(xy[1]))
            w, gw = response_gradient(mf, f, extra_args=(x, y))
        else:
            f = _omega_functional(mf, singlet, rpa=False)
            x = jnp.asarray(np.asarray(xy[0]))
            w, gw = response_gradient(mf, f, extra_args=(x,))
        self.de = np.asarray(g0 + gw)
        self.e_excite = float(w)
        return self.de

    run = kernel
