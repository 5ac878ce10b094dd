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


def _augmented(cc, ghost='virtual'):
    """Pad the spin-orbital system with one zero-interaction ghost orbital.

    A ghost VIRTUAL with zero Fock/integrals decouples exactly, and the EE
    Jacobian restricted to determinants containing the ghost particle IS
    the IP-EOM-CCSD matrix (the continuum-orbital construction); a ghost
    OCCUPIED gives EA the same way. t amplitudes are padded with zeros."""
    t1, t2 = cc.t1, cc.t2
    nocc, nvir = t1.shape
    eris = np.asarray(cc._eris_so)
    mo_e = np.asarray(cc._mo_e_so)
    nso = eris.shape[0]
    E = np.zeros((nso + 1,) * 4)
    if ghost == 'virtual':
        E[:nso, :nso, :nso, :nso] = eris    # ghost appended at the end
        f = np.diag(np.append(mo_e, 0.0))
        t1a = np.zeros((nocc, nvir + 1))
        t1a[:, :nvir] = np.asarray(t1)
        t2a = np.zeros((nocc, nocc, nvir + 1, nvir + 1))
        t2a[:, :, :nvir, :nvir] = np.asarray(t2)
        return (jnp.asarray(t1a), jnp.asarray(t2a), jnp.asarray(f),
                jnp.asarray(E), nocc, nvir + 1)
    # ghost occupied: inserted as orbital index 0 (occupied block front)
    E2 = np.zeros((nso + 1,) * 4)
    E2[1:, 1:, 1:, 1:] = eris
    f = np.zeros((nso + 1, nso + 1))
    f[1:, 1:] = np.diag(mo_e)
    t1a = np.zeros((nocc + 1, nvir))
    t1a[1:, :] = np.asarray(t1)
    t2a = np.zeros((nocc + 1, nocc + 1, nvir, nvir))
    t2a[1:, 1:] = np.asarray(t2)
    return (jnp.asarray(t1a), jnp.asarray(t2a), jnp.asarray(f),
            jnp.asarray(E2), nocc + 1, nvir)


class EOMIP:
    """IP-EOM-CCSD via the ghost-virtual embedding of the CC Jacobian."""

    nstates = 3

    def __init__(self, cc):
        self._cc = cc
        self.e = None

    def kernel(self, nstates=None):
        n = nstates or self.nstates
        t1, t2, f, eris, nocc, nvir = _augmented(self._cc, 'virtual')
        matvec = _jacobian_matvec(t1, t2, f, eris)
        g = nvir - 1                      # ghost virtual index
        dim = nocc + nocc * nocc * (nvir - 1)
        cols = []
        basis = []
        # 1h: z1[i, ghost]
        for i in range(nocc):
            z1 = np.zeros((nocc, nvir))
            z1[i, g] = 1.0
            basis.append((z1, np.zeros((nocc, nocc, nvir, nvir))))
        # 2h1p: z2[i, j, a, ghost] antisymmetrized, i < j
        idx2 = []
        for i in range(nocc):
            for j in range(i + 1, nocc):
                for a in range(nvir - 1):
                    z2 = np.zeros((nocc, nocc, nvir, nvir))
                    z2[i, j, a, g] = 1.0
                    z2[j, i, a, g] = -1.0
                    z2[i, j, g, a] = -1.0
                    z2[j, i, g, a] = 1.0
                    basis.append((np.zeros((nocc, nvir)), z2))
                    idx2.append((i, j, a))
        dim = len(basis)
        J = np.zeros((dim, dim))
        for c, (z1, z2) in enumerate(basis):
            j1, j2 = matvec(jnp.asarray(z1), jnp.asarray(z2))
            j1 = np.asarray(j1)
            j2 = np.asarray(j2)
            col = np.zeros(dim)
            col[:nocc] = j1[:, g]
            for k, (i, j, a) in enumerate(idx2):
                col[nocc + k] = j2[i, j, a, g]
            J[:, c] = col
        w = np.linalg.eigvals(J)
        w = np.sort(w.real[np.abs(w.imag) < 1e-6])
        # eigenvalues are E(N-1) - E_CC(N): the ionization energies
        self.e = w[:n]
        return self.e

    run = kernel


class EOMEA:
    """EA-EOM-CCSD via the ghost-occupied embedding of the CC Jacobian."""

    nstates = 3

    def __init__(self, cc):
        self._cc = cc
        self.e = None

    def kernel(self, nstates=None):
        n = nstates or self.nstates
        t1, t2, f, eris, nocc, nvir = _augmented(self._cc, 'occupied')
        matvec = _jacobian_matvec(t1, t2, f, eris)
        g = 0                             # ghost occupied index
        basis = []
        idx2 = []
        for a in range(nvir):
            z1 = np.zeros((nocc, nvir))
            z1[g, a] = 1.0
            basis.append((z1, np.zeros((nocc, nocc, nvir, nvir))))
        for i in range(1, nocc):
            for a in range(nvir):
                for b in range(a + 1, nvir):
                    z2 = np.zeros((nocc, nocc, nvir, nvir))
                    z2[g, i, a, b] = 1.0
                    z2[i, g, a, b] = -1.0
                    z2[g, i, b, a] = -1.0
                    z2[i, g, b, a] = 1.0
                    basis.append((np.zeros((nocc, nvir)), z2))
                    idx2.append((i, a, b))
        dim = len(basis)
        nv1 = nvir
        J = np.zeros((dim, dim))
        for c, (z1, z2) in enumerate(basis):
            j1, j2 = matvec(jnp.asarray(z1), jnp.asarray(z2))
            j1 = np.asarray(j1)
            j2 = np.asarray(j2)
            col = np.zeros(dim)
            col[:nv1] = j1[g, :]
            for k, (i, a, b) in enumerate(idx2):
                col[nv1 + k] = j2[g, i, a, b]
            J[:, c] = col
        w = np.linalg.eigvals(J)
        w = np.sort(w.real[np.abs(w.imag) < 1e-6])
        self.e = w[w > 1e-8][:n] if (w > 1e-8).any() else w[:n]
        return self.e

    run = kernel
