"""Analytic MP2 nuclear gradients via the generic orbital-response module.

Reference analog: pyscf/grad/mp2.py (hand-derived z-vector with
_gamma1_intermediates / _gamma2 AO 2-PDM contractions over int2e_ip1).
Here the MP2 correlation energy is written as ONE traceable function of
(X, Co, Cv, e_occ, e_vir) through the DF factorization, and
grad/response.py closes the orbital relaxation with a single CPHF
z-vector solve; all derivative integrals come out of reverse-mode AD.
"""
import numpy as np
import jax.numpy as jnp

from ..ops.device import integral_compute
from .response import response_gradient, make_df_mo_eri_fn
from .autodiff import grad_scf
from .rhf import grad_nuc


def make_mp2_energy_fn(mf):
    """Traceable f(X, Co, Cv, eo, ev) -> E_corr(MP2), closed shell."""
    bov_fn = make_df_mo_eri_fn(mf)

    def f(X, Co, Cv, eo, ev):
        Bov = bov_fn(X, Co, Cv)
        V = jnp.einsum('pia,pjb->iajb', Bov, Bov)
        D = (eo[:, None, None, None] - ev[None, :, None, None]
             + eo[None, None, :, None] - ev[None, None, None, :])
        t2 = V / D
        return jnp.sum(t2 * (2.0 * V - V.transpose(0, 3, 2, 1)))

    return f


class Gradients:
    """g = mp.MP2(mf).Gradients().kernel() -> (natm, 3) numpy array.

    Total gradient = SCF part (autodiff stationary gradient,
    grad/autodiff.py) + correlation part (z-vector response)."""

    def __init__(self, mp):
        self.mp = mp
        self.mf = mp._scf
        self.mol = mp.mol
        self.de = None

    def kernel(self):
        mf = self.mf
        if getattr(mf, 'with_df', None) is None:
            raise NotImplementedError('MP2 gradients need density fitting; '
                                      'use mf.density_fit()')
        if getattr(self.mp, 'frozen', 0):
            raise NotImplementedError('frozen-core MP2 gradients')
        with integral_compute():
            e_scf, g_scf = grad_scf(mf)
            f = make_mp2_energy_fn(mf)
            e_corr, g_corr = response_gradient(mf, f)
        self.e_corr = float(e_corr)
        self.de = np.asarray(g_scf) + np.asarray(g_corr)
        return self.de

    def as_scanner(self):
        """(mol-like with new coords) -> (e_tot, grad); for geomopt."""
        grad_obj = self

        class _Scanner:
            def __init__(self):
                self.mol = grad_obj.mol
                self.converged = True

            def __call__(self, coords_or_mol):
                import pyscf_tpu as pt
                mol0 = grad_obj.mol
                if hasattr(coords_or_mol, 'coords'):
                    new_coords = np.asarray(coords_or_mol.coords)
                else:
                    new_coords = np.asarray(coords_or_mol)
                mol = pt.M(atom=[(el, tuple(xyz)) for el, xyz in
                                 zip(mol0.raw_symbols, new_coords)],
                           unit='bohr', basis=mol0.basis,
                           charge=mol0.charge, spin=mol0.spin,
                           verbose=0)
                mf = type(grad_obj.mf)(mol).density_fit()
                mf.conv_tol = 1e-11
                mf.kernel()
                from ..mp import MP2
                mp = MP2(mf)
                ecorr = float(mp.kernel()[0])
                g = Gradients(mp).kernel()
                self.converged = mf.converged
                return float(mf.e_tot) + ecorr, g

        return _Scanner()
