"""Cholesky-localized molecular orbitals.

Reference analog: pyscf/lo/cholesky.py (Aquilante et al., JCP 125, 174101
(2006)): a pivoted Cholesky factorization of the AO density matrix
P = C C^T yields another square root L = C Q (Q orthogonal), whose columns
are localized because the pivoting greedily picks dominant AO centers.
"""
import numpy as np
import scipy.linalg


def cholesky_mos(mo_coeff, tol=1e-12):
    """Localize the span of mo_coeff via pivoted Cholesky of C C^T."""
    c = np.asarray(mo_coeff)
    n = c.shape[1]
    p = c @ c.T
    chol, piv, rank, _ = scipy.linalg.lapack.dpstrf(p, tol=tol, lower=1)
    if rank < n:
        raise RuntimeError(f'density rank {rank} < norb {n}')
    piv = piv - 1                      # LAPACK is 1-indexed
    L = np.tril(chol)[:, :n]
    # undo the symmetric pivoting: rows of L are in pivoted order
    out = np.zeros_like(L)
    out[piv] = L
    return out
