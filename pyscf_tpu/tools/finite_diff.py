"""Finite-difference derivative helpers (analog of reference
pyscf/tools/finite_diff.py), used as the cross-check oracle for every
analytic derivative in tests/."""
import numpy as np


def grad(efun, coords0, step=1e-4):
    """(natm, 3) central-difference gradient of efun(coords)."""
    coords0 = np.asarray(coords0, dtype=float)
    g = np.zeros_like(coords0)
    for a in range(coords0.shape[0]):
        for x in range(3):
            cp = coords0.copy()
            cp[a, x] += step
            cm = coords0.copy()
            cm[a, x] -= step
            g[a, x] = (efun(cp) - efun(cm)) / (2 * step)
    return g


def hessian(gfun, coords0, step=1e-3):
    """(natm,3,natm,3) Hessian from central differences of gradients."""
    coords0 = np.asarray(coords0, dtype=float)
    natm = coords0.shape[0]
    h = np.zeros((natm, 3, natm, 3))
    for a in range(natm):
        for x in range(3):
            cp = coords0.copy()
            cp[a, x] += step
            cm = coords0.copy()
            cm[a, x] -= step
            h[a, x] = (np.asarray(gfun(cp)) - np.asarray(gfun(cm))) \
                / (2 * step)
    return 0.5 * (h + h.transpose(2, 3, 0, 1))
