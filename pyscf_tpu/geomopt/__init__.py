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


def optimize_ts(mf_factory, mol, maxsteps=40, gtol=3e-4, trust=0.15,
                hess_update_every=0):
    """First-order saddle-point search by partitioned rational-function
    optimization (P-RFO, eigenvector following) on the analytic or
    FD-of-analytic-gradient Hessian (reference workflow: geomeTRIC
    transition=True driven through pyscf scanners).

    Maximizes along the lowest Hessian eigenmode, minimizes along the
    rest; the Hessian is recomputed every `hess_update_every` steps
    (0 = only at the start, then Bofill-updated from gradients).

    Returns (mol_at_ts, energies).
    """
    mol = mol.copy()
    natm = mol.natm
    n = 3 * natm
    energies = []

    def eval_eg(x):
        m = mol.copy()
        m.set_geom_(x.reshape(-1, 3))
        mf = mf_factory(m)
        e = float(mf.e_tot)
        g = np.asarray(mf.Gradients().kernel()).ravel()
        return e, g, mf

    def eval_hess(mf):
        from ..hessian import Hessian
        return np.asarray(Hessian(mf).kernel()).reshape(n, n)

    x = np.asarray(mol.coords).ravel().copy()
    e, g, mf = eval_eg(x)
    energies.append(e)
    H = eval_hess(mf)
    g_old = x_old = None
    for step in range(maxsteps):
        if abs(g).max() < gtol:
            break
        if hess_update_every and step and step % hess_update_every == 0:
            H = eval_hess(mf)
        elif g_old is not None:
            # Bofill update (mixed SR1/PSB), standard for TS searches
            dx = x - x_old
            dg = g - g_old
            xi = dg - H @ dx
            denom_sr1 = xi @ dx
            phi = 0.0
            if abs(denom_sr1) > 1e-12:
                phi = (xi @ dx) ** 2 / ((xi @ xi) * (dx @ dx) + 1e-30)
                H = H + phi * np.outer(xi, xi) / denom_sr1
            dd = dx @ dx
            if dd > 1e-14:
                H = H + (1 - phi) * (
                    (np.outer(xi, dx) + np.outer(dx, xi)) / dd
                    - (xi @ dx) * np.outer(dx, dx) / dd ** 2)
        w, V = np.linalg.eigh(0.5 * (H + H.T))
        gq = V.T @ g
        # partition: maximize along mode 0, minimize along the rest
        # P-RFO shift parameters
        b0, g0 = w[0], gq[0]
        lam_max = 0.5 * (b0 + np.sqrt(b0 * b0 + 4.0 * g0 * g0))
        rest_b, rest_g = w[1:], gq[1:]
        # lambda_min below the smallest remaining eigenvalue
        lam = min(0.0, rest_b.min() if rest_b.size else 0.0) - 1e-6
        for _ in range(100):
            f = np.sum(rest_g ** 2 / (lam - rest_b)) - lam
            df = -np.sum(rest_g ** 2 / (lam - rest_b) ** 2) - 1.0
            step_l = f / df
            lam -= step_l
            if abs(step_l) < 1e-12:
                break
        dq = np.zeros(n)
        dq[0] = -g0 / (b0 - lam_max)
        dq[1:] = -rest_g / (rest_b - lam)
        dx = V @ dq
        norm = np.linalg.norm(dx)
        if norm > trust:
            dx *= trust / norm
        x_old, g_old = x, g
        x = x + dx
        e, g, mf = eval_eg(x)
        energies.append(e)
    mol.set_geom_(x.reshape(-1, 3))
    mol._ts_grad_norm = float(abs(g).max())
    return mol, energies


from . import internal
