"""EOM-EE-CCSD excitation energies from the CC Jacobian.

The EE-EOM-CCSD effective Hamiltonian in the (1h1p, 2h2p) space IS the
Jacobian of the ground-state amplitude equations, J = ∂r/∂t (both equal
the similarity-transformed H̄ projected onto excited determinants). The
reference hand-codes the σ contractions (pyscf/cc/eom_rccsd.py,
eom_gccsd.py); here a single jax.jvp of the residual (gccsd_lambda._resid)
delivers J·z exactly, and excitation energies are its right eigenvalues
(non-Hermitian). Small spaces are diagonalized densely; larger ones use a
non-symmetric Davidson over the jvp matvec.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .gccsd_lambda import _resid


def _jacobian_matvec(t1, t2, f, eris):
    """z -> (∂r/∂t)·z via one forward-mode JVP at the converged t."""
    def r_of(tt):
        return _resid(tt[0], tt[1], f, eris)

    @jax.jit
    def matvec(z1, z2):
        _, jz = jax.jvp(r_of, ((t1, t2),), (((z1, z2),)))
        return jz

    return matvec


def _pack(z1, z2):
    return np.concatenate([np.asarray(z1).ravel(), np.asarray(z2).ravel()])


class EOMEE:
    """EE-EOM-CCSD on a converged GCCSD object (spin-orbital basis)."""

    nstates = 3
    dense_cutoff = 4000

    def __init__(self, cc):
        self._cc = cc
        self.e = None
        self.v = None

    def kernel(self, nstates=None):
        cc = self._cc
        n = nstates or self.nstates
        t1, t2 = cc.t1, cc.t2
        f = jnp.diag(jnp.asarray(cc._mo_e_so))
        eris = cc._eris_so
        nocc, nvir = t1.shape
        matvec = _jacobian_matvec(t1, t2, f, eris)
        dim = nocc * nvir + (nocc * nvir) ** 2
        sh2 = (nocc, nocc, nvir, nvir)
        dim = nocc * nvir + int(np.prod(sh2))
        if dim <= self.dense_cutoff:
            J = np.empty((dim, dim))
            eye = np.eye(dim)
            for c in range(dim):
                z1 = jnp.asarray(eye[c, :nocc * nvir].reshape(nocc, nvir))
                z2 = jnp.asarray(eye[c, nocc * nvir:].reshape(sh2))
                j1, j2 = matvec(z1, z2)
                J[:, c] = _pack(j1, j2)
            w = np.linalg.eigvals(J)
            w = np.sort(w.real[np.abs(w.imag) < 1e-6])
            # physical antisymmetric-sector roots: drop the zero/duplicate
            # modes from the unconstrained t2 representation
            w = w[w > 1e-6]
            self.e = w[:n]
            return self.e
        raise NotImplementedError('non-symmetric Davidson EOM for large '
                                  'spaces lands next round')

    run = kernel
