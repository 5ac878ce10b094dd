"""RKS nuclear gradients (analog of reference pyscf/grad/rks.py:33).

DF mean-fields use the autodiff fixed-density path (grad/autodiff.py):
exact Hellmann-Feynman + Pulay derivatives from jax.grad of a traceable
energy, with Becke weights fixed (reference default grid_response=False).
Non-DF objects fall back to finite differences.
"""
import numpy as np


class Gradients:
    def __init__(self, mf):
        self._scf = mf
        self.mol = mf.mol
        self.de = None

    def kernel(self, step=1e-4):
        mf0 = self._scf
        if getattr(mf0, 'with_df', None) is not None:
            from .autodiff import grad_scf
            e_chk, self.de = grad_scf(mf0)
            if abs(e_chk - mf0.e_tot) > 1e-6:
                raise RuntimeError(
                    f'gradient energy check failed: {e_chk} vs {mf0.e_tot}')
            return self.de
        from .rhf import finite_difference_gradient

        def efac(m):
            mf = m.RKS(xc=mf0.xc)
            mf.verbose = 0
            mf.conv_tol = max(mf0.conv_tol, 1e-11)
            mf.grids.atom_grid = getattr(mf0.grids, 'atom_grid', None)
            return mf.kernel()

        self.de = finite_difference_gradient(efac, self.mol, step)
        return self.de

    run = kernel
