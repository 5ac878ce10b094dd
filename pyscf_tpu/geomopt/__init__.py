"""Geometry optimization (analog of reference pyscf/geomopt).

The reference drives external engines (geomeTRIC/pyberny); here a native
BFGS optimizer in Cartesian coordinates over the method's Gradients
(analytic where available, finite-difference fallback).
"""
import numpy as np


def optimize(mf_factory, mol, maxsteps=50, gtol=3e-4, use_analytic=True):
    """Minimize the energy over nuclear coordinates.

    mf_factory(mol) -> converged object with .e_tot and optionally
    .Gradients(). Returns (mol_optimized, energies).
    """
    import scipy.optimize
    mol = mol.copy()
    energies = []

    def fun(x):
        m = mol.copy()
        m.set_geom_(x.reshape(-1, 3))
        mf = mf_factory(m)
        e = mf.e_tot if hasattr(mf, 'e_tot') else mf
        energies.append(float(e))
        if use_analytic and hasattr(mf, 'Gradients'):
            g = np.asarray(mf.Gradients().kernel())
        else:
            from ..grad.rhf import finite_difference_gradient
            def efac(m2):
                r = mf_factory(m2)
                return r.e_tot if hasattr(r, 'e_tot') else r
            g = finite_difference_gradient(efac, m)
        return float(e), g.ravel()

    res = scipy.optimize.minimize(
        fun, np.asarray(mol.coords).ravel(), jac=True, method='BFGS',
        options={'maxiter': maxsteps, 'gtol': gtol, 'norm': np.inf})
    mol.set_geom_(res.x.reshape(-1, 3))
    return mol, energies
from . import internal
