"""RKS nuclear gradients.

Round-1 path: finite differences of the converged energy (the analytic
XC-grid gradient with grid response lands with the DF-gradient build).
Analog of reference pyscf/grad/rks.py.
"""
import numpy as np


class Gradients:
    def __init__(self, mf):
        self._scf = mf
        self.mol = mf.mol
        self.de = None

    def kernel(self, step=1e-4):
        from .rhf import finite_difference_gradient
        mf0 = self._scf

        def efac(m):
            mf = m.RKS(xc=mf0.xc) if not getattr(mf0, 'with_df', None) \
                else m.RKS(xc=mf0.xc).density_fit()
            mf.verbose = 0
            mf.conv_tol = max(mf0.conv_tol, 1e-11)
            return mf.kernel()

        self.de = finite_difference_gradient(efac, self.mol, step)
        return self.de

    run = kernel
