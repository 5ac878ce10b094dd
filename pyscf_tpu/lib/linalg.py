"""Linear-algebra helpers: generalized eigensolver, canonical orthogonalization,
Davidson iterative eigensolver.

Analog of the reference's pyscf/lib/linalg_helper.py (davidson1:290,
safe_eigh:55) and the eig path of scf/hf.py:1363-1391, re-expressed as
dense XLA ops (TPU eigh) instead of LAPACK generalized solvers.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def eigh(a, refine=3):
    """Accurate symmetric eigendecomposition: XLA eigh + refinement.

    jax 0.9's eigh (CPU and TPU lowering alike) returns eigenvectors with
    residual ||A V - V w|| as large as ~1e-6 at n=580 (measured; LAPACK
    gives 1e-15) - fatal for the 1e-8 Ha SCF contract. Each Ogita-Aishima
    refinement step [Ogita & Aishima, JSIAM Lett. 2018] squares the
    error using only matmuls (MXU-friendly, traceable):
        R = I - V^T V,  S = V^T A V,  w~ = diag(S)
        E_ij = (S_ij + w~_j R_ij) / (w~_j - w~_i)   (well-separated pairs)
        E_ij = R_ij / 2                              (near-degenerate)
        V <- V + V E
    Near-degenerate clusters keep only the orthonormalization part: the
    in-cluster rotation is arbitrary and does not affect densities.
    """
    w, v = jnp.linalg.eigh(a)
    if a.dtype != jnp.float64:
        # the f32 pre-stage only warm-starts the f64 loop; refinement
        # noise floors are dtype-specific and not worth tuning there
        return w, v
    # the gap floor below which a pair counts as degenerate: the first
    # pass must exceed the eigensolver's own eigenvalue noise (~1e-7
    # relative); after one pass the diagonal of S is a Rayleigh quotient
    # (error ~ residual^2 / gap) and the floor can drop
    floors = [1e-5] + [1e-7] * max(0, refine - 1)
    for floor in floors[:refine]:
        av = a @ v
        S = v.T @ av
        R = jnp.eye(a.shape[0], dtype=a.dtype) - v.T @ v
        wt = jnp.diagonal(S)
        den = wt[None, :] - wt[:, None]
        num = S + wt[None, :] * R
        # accept the first-order rotation wherever it is SMALL (stable);
        # a pair is "degenerate" exactly when the implied rotation would
        # be large, and there only orthonormalization is applied
        E_cand = num / jnp.where(den == 0.0, 1.0, den)
        # accept the first-order rotation only when (a) it is small and
        # (b) the gap clearly exceeds the eigensolver's eigenvalue error
        # (a near-degenerate "gap" of ~1e-7 is pure noise and produces
        # confidently wrong 0.01-size rotations)
        scale = jnp.maximum(jnp.max(jnp.abs(wt)), 1.0)
        safe = (jnp.abs(E_cand) < 0.05) & (jnp.abs(den) > floor * scale)
        # orthonormality needs E_ij + E_ji == R_ij exactly; the rotation
        # formula satisfies it pairwise, so accept/reject PAIRS together
        safe = safe & safe.T
        E = jnp.where(safe, E_cand, R / 2.0)
        E = E - jnp.diag(jnp.diagonal(E)) + jnp.diag(jnp.diagonal(R) / 2.0)
        v = v + v @ E
        w = jnp.diagonal(v.T @ (a @ v)) / jnp.diagonal(v.T @ v)
    # exact ascending order can be perturbed by refinement: restore it
    order = jnp.argsort(w)
    return w[order], v[:, order]


def canonical_orth(s, thresh=1e-8):
    """X with X^T S X = I, dropping near-singular directions (Lowdin canonical).

    Mirrors reference scf/addons.py remove_linear_dep_ / hf.py:1363.
    Note: keeps static shape; dropped directions are zero columns.
    """
    w, v = eigh(s)
    keep = w > thresh
    winv = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, w, 1.0)), 0.0)
    return v * winv[None, :]


@jax.jit
def eigh_gen(f, x):
    """Solve F C = S C e given X = S^{-1/2}: returns (e, C)."""
    fp = x.T @ f @ x
    e, cp = eigh(fp)
    return e, x @ cp


def davidson(matvec, x0, neig=1, max_cycle=60, tol=1e-10, max_space=14,
             hdiag=None, verbose=0):
    """Davidson eigensolver for the lowest eigenpairs of a symmetric operator.

    Host-driven subspace loop with device matvecs (the contraction dominates;
    the small subspace solve runs on host). Returns (evals, evecs, converged).
    """
    x0 = np.asarray(x0)
    if x0.ndim == 1:
        x0 = x0[None]
    # the subspace must fit the retained Ritz set PLUS new correction
    # vectors, or the restart below fires every iteration and the solver
    # spins on a frozen subspace (seen as conv=False with many roots)
    max_space = max(max_space, 3 * (neig + 2))
    n = x0.shape[1]
    V = []      # orthonormal basis (numpy host copies)
    AV = []
    theta_old = None
    hd = np.asarray(hdiag) if hdiag is not None else None
    conv = False
    # seed
    for v in x0:
        v = v / np.linalg.norm(v)
        V.append(v)
    evals = evecs = None
    for it in range(max_cycle):
        # orthonormalize any new vectors (modified Gram-Schmidt)
        nv = len(V)
        while len(AV) < nv:
            w = np.asarray(matvec(jnp.asarray(V[len(AV)])))
            AV.append(w)
        Vm = np.stack(V)
        AVm = np.stack(AV)
        H = Vm @ AVm.T
        H = 0.5 * (H + H.T)
        theta, S = np.linalg.eigh(H)
        # work with guard roots beyond the requested ones so a restart
        # doesn't discard low-spectrum components the current Ritz set
        # hasn't resolved yet (otherwise the solver can lock onto an
        # excited eigenvector and report it converged)
        nroot = min(neig + 2, len(theta))
        theta = theta[:nroot]
        S = S[:, :nroot]
        X = S.T @ Vm                      # ritz vectors (nroot, n)
        AX = S.T @ AVm
        R = AX - theta[:, None] * X
        rnorm = np.linalg.norm(R, axis=1)
        evals, evecs = theta[:neig], X[:neig]
        if np.all(rnorm[:neig] < tol) or (
                theta_old is not None
                and np.all(np.abs(theta[:neig] - theta_old) < tol * 1e-2)
                and np.all(rnorm[:neig] < np.sqrt(tol))):
            conv = True
            break
        theta_old = theta[:neig]
        if len(V) + nroot > max_space:
            # restart with current ritz vectors (guards included)
            V = [X[i] / np.linalg.norm(X[i]) for i in range(nroot)]
            AV = []
            continue
        for i in range(nroot):
            if rnorm[i] < tol:
                continue
            if hd is not None:
                denom = hd - theta[i]
                denom = np.where(np.abs(denom) < 1e-8,
                                 np.sign(denom + 1e-30) * 1e-8, denom)
                t = R[i] / denom
            else:
                t = R[i]
            # orthogonalize against V
            for v in V:
                t -= (v @ t) * v
            nrm = np.linalg.norm(t)
            if nrm > 1e-7:
                V.append(t / nrm)
    return evals, evecs, conv


def davidson_nosym(matvec, x0, neig=1, max_cycle=80, tol=1e-9,
                   max_space=None, hdiag=None):
    """Davidson for the lowest-real-eigenvalue pairs of a NON-symmetric
    operator with a real spectrum (similar to a symmetric matrix, e.g.
    the closed-shell CISD Hamiltonian in biorthogonal amplitude
    coordinates). Orthonormal subspace, oblique (non-symmetric) Rayleigh
    projection, diagonal preconditioning.

    Analog of reference lib/linalg_helper.py davidson_nosym1:741.
    Returns (evals (neig,), evecs (neig, n), converged)."""
    x0 = np.asarray(x0)
    if x0.ndim == 1:
        x0 = x0[None]
    if max_space is None:
        max_space = max(3 * (neig + 2), 14)
    hd = None if hdiag is None else np.asarray(hdiag)
    V = []
    AV = []
    for v in x0:
        t = v.astype(float).copy()
        for u in V:
            t -= (u @ t) * u
        nrm = np.linalg.norm(t)
        if nrm > 1e-10:
            V.append(t / nrm)
            AV.append(np.asarray(matvec(V[-1])))
    conv = False
    evals = np.zeros(neig)
    evecs = np.zeros((neig, x0.shape[1]))
    theta_old = None
    for _ in range(max_cycle):
        Vm = np.stack(V)
        AVm = np.stack(AV)
        Am = Vm @ AVm.T                       # (m, m) non-symmetric
        w, s = np.linalg.eig(Am)              # columns: right eigvecs
        order = np.argsort(w.real)
        w = w[order]
        s = s[:, order]
        nroot = min(neig + 2, len(w))
        X = np.real(s[:, :nroot].T @ Vm)
        AX = np.real(s[:, :nroot].T @ AVm)
        theta = w.real[:nroot]
        # renormalize ritz vectors
        nx = np.linalg.norm(X, axis=1, keepdims=True)
        X = X / nx
        AX = AX / nx
        R = AX - theta[:, None] * X
        rnorm = np.linalg.norm(R, axis=1)
        evals, evecs = theta[:neig], X[:neig]
        if np.all(rnorm[:neig] < tol) or (
                theta_old is not None
                and np.all(np.abs(theta[:neig] - theta_old) < tol * 1e-2)
                and np.all(rnorm[:neig] < np.sqrt(tol))):
            conv = True
            break
        theta_old = theta[:neig]
        if len(V) + nroot > max_space:
            V = []
            AV = []
            for i in range(nroot):
                t = X[i].copy()
                for u in V:
                    t -= (u @ t) * u
                nrm = np.linalg.norm(t)
                if nrm > 1e-10:
                    V.append(t / nrm)
                    AV.append(np.asarray(matvec(V[-1])))
            continue
        for i in range(nroot):
            if rnorm[i] < tol:
                continue
            if hd is not None:
                denom = hd - theta[i]
                denom = np.where(np.abs(denom) < 1e-8,
                                 np.sign(denom + 1e-30) * 1e-8, denom)
                t = R[i] / denom
            else:
                t = R[i].copy()
            for u in V:
                t -= (u @ t) * u
            nrm = np.linalg.norm(t)
            if nrm > 1e-7:
                V.append(t / nrm)
                AV.append(np.asarray(matvec(V[-1])))
    return evals, evecs, conv
