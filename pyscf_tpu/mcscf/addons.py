"""MCSCF addons: state-averaged CASSCF/CASCI.

Reference analog: pyscf/mcscf/addons.py (state_average_). The CASCI/
CASSCF drivers talk to their fcisolver through kernel/make_rdm1/
make_rdm12; state averaging swaps in a solver that solves nroots
eigenstates and returns the weight-averaged energy and densities, so the
orbital optimization minimizes the ensemble energy.
"""
import numpy as np

from ..fci import direct_spin1


class SAFCISolver:
    """Weighted multi-root wrapper over fci.direct_spin1."""

    def __init__(self, weights, solver=direct_spin1):
        self.weights = np.asarray(weights, dtype=float)
        self.weights /= self.weights.sum()
        self.nroots = len(self.weights)
        self._solver = solver
        self.e_states = None

    def kernel(self, h1e, eri, norb, nelec, ecore=0.0, ci0=None, **kwargs):
        if ci0 is not None and isinstance(ci0, (list, tuple)):
            ci0 = np.stack([np.asarray(c).ravel() for c in ci0])
        es, cs = self._solver.kernel(h1e, eri, norb, nelec, ecore=ecore,
                                     ci0=ci0, nroots=self.nroots)
        self.e_states = np.asarray(es)
        e_avg = float(self.weights @ self.e_states)
        return e_avg, list(cs)

    def make_rdm1(self, ci, norb, nelec):
        out = 0.0
        for w, c in zip(self.weights, ci):
            out = out + w * np.asarray(self._solver.make_rdm1(c, norb, nelec))
        return out

    def make_rdm12(self, ci, norb, nelec):
        d1 = d2 = 0.0
        for w, c in zip(self.weights, ci):
            a, b = self._solver.make_rdm12(c, norb, nelec)
            d1 = d1 + w * np.asarray(a)
            d2 = d2 + w * np.asarray(b)
        return d1, d2


def state_average_(mc, weights=(0.5, 0.5)):
    """Make mc optimize the weighted ensemble of the lowest states.

    After kernel(), mc.e_states holds the individual state energies and
    mc.ci is the list of CI vectors.
    """
    mc.fcisolver = SAFCISolver(weights)
    return mc


def state_average(mc, weights=(0.5, 0.5)):
    import copy
    return state_average_(copy.copy(mc), weights)
