"""UHF nuclear gradients (finite-difference path; analytic follows the
RHF machinery in a later round). Analog of reference pyscf/grad/uhf.py."""
import numpy as np


class Gradients:
    def __init__(self, mf):
        self._scf = mf
        self.mol = mf.mol
        self.de = None

    def kernel(self, step=1e-4):
        from .rhf import finite_difference_gradient
        mf0 = self._scf
        spin = self.mol.spin

        def efac(m):
            from ..scf.uhf import UHF
            mf = UHF(m)
            mf.verbose = 0
            mf.conv_tol = max(mf0.conv_tol, 1e-11)
            return mf.kernel()

        self.de = finite_difference_gradient(efac, self.mol, step)
        return self.de

    run = kernel
