"""Coupled-perturbed HF/KS linear-response solver (analog of reference
pyscf/scf/cphf.py solve): preconditioned Krylov (GMRES-free simple
conjugate-gradient-style iteration on the symmetric (A+B) operator)."""
import numpy as np


def solve(apb_matvec, hdiag, rhs, max_cycle=50, tol=1e-9):
    """Solve (A+B) z = rhs for each column of rhs via preconditioned CG.

    apb_matvec(z) applies the response matrix; hdiag is its diagonal
    (orbital-energy differences) used as the preconditioner."""
    rhs = np.atleast_2d(rhs)
    out = []
    for b in rhs:
        z = b / hdiag
        r = b - np.asarray(apb_matvec(z))
        p = r / hdiag
        rz = float(r @ (r / hdiag))
        for it in range(max_cycle):
            if np.linalg.norm(r) < tol:
                break
            Ap = np.asarray(apb_matvec(p))
            alpha = rz / float(p @ Ap)
            z = z + alpha * p
            r = r - alpha * Ap
            rz_new = float(r @ (r / hdiag))
            p = r / hdiag + (rz_new / rz) * p
            rz = rz_new
        out.append(z)
    return np.stack(out)
