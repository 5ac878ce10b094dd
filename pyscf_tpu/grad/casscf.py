"""Analytic CASSCF nuclear gradients by exploiting full variationality.

Reference analog: pyscf/grad/casscf.py (hand-derived generalized-Fock /
effective-2-PDM contractions over derivative integrals). A converged
CASSCF energy is stationary with respect to BOTH its CI coefficients and
ALL orbital rotations (core-active, core-virtual, active-virtual; the
remaining core-core/active-active rotations leave it invariant), so its
nuclear gradient needs NO response equations at all: it is the partial
derivative of a traceable energy in which the wavefunction parameters
are frozen and the orbitals follow the geometry only through the
orthonormality connection

    C(X) = C0 . (C0^T S(X) C0)^{-1/2}

evaluated on the occupied (core+active) block. The inverse square root
is a 3-step Newton-Schulz iteration (pure matmuls, MXU-friendly, no
eigh): at the converged geometry the argument is the identity, where the
iteration's value AND first derivative are exact. jax.grad of this
energy therefore emits the exact Hellmann-Feynman + Pulay gradient
program, with every derivative integral coming from reverse-mode AD of
the McMurchie-Davidson pair tables (grad/autodiff.py builders).

Requires the DF-consistent CAS problem (mc.density_fit(); analog of
reference mcscf/df.py) so that the differentiated energy expression is
exactly the converged one. State-averaged CASSCF is supported: the SA
energy is variational, and its gradient uses the weight-averaged RDMs.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..ops.device import integral_compute
from ..grad.autodiff import _j2c, _enuc, _build_host_data_cached
from ..hessian.rhf import _s_h_builders, _j3c_builder


def _invsqrt_ns(M, iters=3):
    """M^{-1/2} by Newton-Schulz; exact value+jvp at M = I."""
    Y = jnp.eye(M.shape[0], dtype=M.dtype)
    eye3 = 3.0 * Y
    for _ in range(iters):
        Y = 0.5 * (Y @ (eye3 - M @ Y @ Y))
    return Y


def _cas_rdms(mc):
    """(casdm1, casdm2), weight-averaged for state-averaged solvers."""
    ci = mc.ci
    weights = getattr(mc.fcisolver, 'weights', None)
    if isinstance(ci, (list, tuple)) and weights is not None:
        d1 = 0
        d2 = 0
        from ..fci import direct_spin1
        for w, c in zip(weights, ci):
            a, b = direct_spin1.make_rdm12(c, mc.ncas, mc.nelecas)
            d1 = d1 + w * np.asarray(a)
            d2 = d2 + w * np.asarray(b)
        return d1, d2
    return mc.fcisolver.make_rdm12(ci, mc.ncas, mc.nelecas)


def grad_casscf(mc):
    """(e_tot, grad (natm,3)) for a converged DF-CASSCF object."""
    mol = mc.mol
    wdf = getattr(mc, 'with_df', None)
    if wdf is None:
        raise NotImplementedError('analytic CASSCF gradients require the '
                                  'DF-consistent CAS energy: run '
                                  'mc.density_fit() before mc.kernel()')
    auxmol = wdf.auxmol
    naux = auxmol.nao
    nao = mol.nao
    ncore, ncas = mc.ncore, mc.ncas
    nocc = ncore + ncas
    casdm1, casdm2 = _cas_rdms(mc)
    d1 = jnp.asarray(np.asarray(casdm1))
    d2 = jnp.asarray(np.asarray(casdm2))
    C0 = jnp.asarray(np.asarray(mc.mo_coeff))[:, :nocc]
    Z = jnp.asarray(np.asarray(mol.charges, dtype=np.float64))
    X0 = jnp.asarray(np.asarray(mol.coords))

    pairs, auxes = _build_host_data_cached(mol, auxmol)
    s_fun, h_fun = _s_h_builders(mol, pairs)
    j3c_fun = _j3c_builder(mol, auxmol, pairs, auxes)

    def energy(X):
        S = s_fun(X)
        C = C0 @ _invsqrt_ns(C0.T @ S @ C0)
        Cc, Ca = C[:, :ncore], C[:, ncore:]
        h = h_fun(X)
        j3 = j3c_fun(X)
        j2 = _j2c(auxes, naux, X)
        L = jnp.linalg.cholesky(j2)
        B = jax.scipy.linalg.solve_triangular(
            L, j3.reshape(nao * nao, naux).T, lower=True)
        B = B.reshape(naux, nao, nao)
        Dc = 2.0 * Cc @ Cc.T
        Da = Ca @ d1 @ Ca.T
        gam = jnp.einsum('pij,ji->p', B, Dc)
        Jc = jnp.einsum('p,pij->ij', gam, B)
        BDc = jnp.einsum('pik,kl->pil', B, Dc)
        Kc = jnp.einsum('pil,plj->ij', BDc, B)
        vhfc = Jc - 0.5 * Kc
        e1 = jnp.sum((Dc + Da) * h)
        e2 = 0.5 * jnp.sum(Dc * vhfc) + jnp.sum(Da * vhfc)
        Ba = jnp.einsum('pij,it,ju->ptu', B, Ca, Ca)
        e2aa = 0.5 * jnp.einsum('ptu,pvw,tuvw->', Ba, Ba, d2)
        return e1 + e2 + e2aa + _enuc(X, Z)

    with integral_compute():
        e_tot, grad = jax.value_and_grad(energy)(X0)
    return e_tot, grad


class Gradients:
    """g = mcscf.CASSCF(...).density_fit().run(); Gradients(mc).kernel()"""

    def __init__(self, mc):
        self.mc = mc
        self.mol = mc.mol
        self.de = None

    def kernel(self):
        e, g = grad_casscf(self.mc)
        self.e_tot = float(e)
        self.de = np.asarray(g)
        return self.de

    def as_scanner(self):
        grad_obj = self

        class _Scanner:
            def __init__(self):
                self.mol = grad_obj.mol
                self.converged = True

            def __call__(self, coords_or_mol):
                import pyscf_tpu as pt
                from ..mcscf import CASSCF
                mol0 = grad_obj.mol
                mc0 = grad_obj.mc
                if hasattr(coords_or_mol, 'coords'):
                    new_coords = np.asarray(coords_or_mol.coords)
                else:
                    new_coords = np.asarray(coords_or_mol)
                mol = pt.M(atom=[(el, tuple(xyz)) for el, xyz in
                                 zip(mol0.raw_symbols, new_coords)],
                           unit='bohr', basis=mol0.basis,
                           charge=mol0.charge, spin=mol0.spin, verbose=0)
                mf = type(mc0._scf)(mol).density_fit()
                mf.conv_tol = 1e-11
                mf.kernel()
                mc = CASSCF(mf, mc0.ncas, mc0.nelecas,
                            ncore=mc0.ncore).density_fit()
                mc.kernel()
                g = Gradients(mc).kernel()
                self.converged = bool(getattr(mc, 'converged', True))
                return float(mc.e_tot), g

        return _Scanner()
