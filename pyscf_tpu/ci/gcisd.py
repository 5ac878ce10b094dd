"""Spin-orbital CISD (covers GCISD/UCISD) via the CC Jacobian.

Reference analog: pyscf/ci/gcisd.py / ucisd.py. The (S+D)x(S+D) block of
the CI Hamiltonian for canonical orbitals equals the linearization of
the CCSD residual at t=0, so the matvec is one jax.jvp of the validated
spin-orbital CCSD update (cc/gccsd.py) — no re-derived amplitude
algebra. The reference-determinant couplings are the bare <ij||ab>.

Oracles (tests/test_ci_extras.py): CISD == FCI for two-electron
systems; closed-shell GCISD == the spatial-orbital RCISD module.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..cc.gccsd import _gccsd_update, _spin_orbital_eris
from ..lib.linalg import davidson


class GCISD:
    nroots = 1
    conv_tol = 1e-9
    max_cycle = 150

    def __init__(self, mf, frozen=0):
        self._scf = mf
        self.mol = mf.mol
        self.frozen = frozen or 0
        self.e_corr = None

    @property
    def e_tot(self):
        return float(self._scf.e_tot) + float(self.e_corr)

    def kernel(self, nroots=None):
        n = nroots or self.nroots
        eris, mo_e, nocc, spins, orbs = _spin_orbital_eris(self._scf)
        if self.frozen:
            f2 = 2 * self.frozen
            eris = eris[f2:, f2:, f2:, f2:]
            mo_e = mo_e[f2:]
            nocc -= f2
        nso = mo_e.shape[0]
        nvir = nso - nocc
        o = slice(0, nocc)
        v = slice(nocc, None)
        eia = mo_e[:nocc, None] - mo_e[None, nocc:]
        eijab = eia[:, None, :, None] + eia[None, :, None, :]
        oovv = eris[o, o, v, v]
        n1 = nocc * nvir

        def numerators(t1, t2):
            u1, u2 = _gccsd_update(t1, t2, eris, mo_e, jnp.asarray(nocc))
            return u1 * eia, u2 * eijab

        z1 = jnp.zeros((nocc, nvir))
        z2 = jnp.zeros((nocc, nocc, nvir, nvir))

        @jax.jit
        def matvec(x):
            c0 = x[0]
            c1 = x[1:1 + n1].reshape(nocc, nvir)
            y2 = x[1 + n1:].reshape(nocc, nocc, nvir, nvir)
            y2a = 0.25 * (y2 - y2.transpose(1, 0, 2, 3)
                          - y2.transpose(0, 1, 3, 2)
                          + y2.transpose(1, 0, 3, 2))
            spur = y2 - y2a
            c2 = 2.0 * y2a
            # (H - E0) on the S+D block: the CC iteration solves
            # eia*t = driving + V t, so jvp of the numerator IS the
            # off-diagonal V action and the diagonal is -eia = (ea - ei)
            _, (dn1, dn2) = jax.jvp(lambda a, b: numerators(a, b),
                                    (z1, z2), (c1, c2))
            s1 = dn1 - eia * c1
            s2 = dn2 - eijab * c2
            # reference couplings: <0|H|D> = <ij||ab>, <D|H|0> adjoint
            s0 = 0.25 * jnp.sum(oovv * c2).real
            s2 = s2 + jnp.conj(oovv) * c0
            s2y = 0.5 * s2 + 1e3 * spur
            return jnp.concatenate([jnp.asarray(s0).reshape(1),
                                    s1.ravel().real, s2y.ravel().real])

        dim = 1 + n1 + nocc * nocc * nvir * nvir
        hdiag = np.concatenate([[0.0], np.asarray(-eia).ravel(),
                                np.asarray(-eijab).ravel()])
        x0 = np.zeros((max(n + 1, 2), dim))
        x0[0, 0] = 1.0
        order = np.argsort(hdiag[1:1 + n1])
        for i in range(1, x0.shape[0]):
            x0[i, 1 + order[(i - 1) % n1]] = 1.0
        w, vecs, conv = davidson(
            lambda z: np.asarray(matvec(jnp.asarray(z))), x0, neig=n,
            max_cycle=self.max_cycle, tol=self.conv_tol, hdiag=hdiag)
        self.converged = conv
        self.e_corr = float(w[0])
        self.ci = vecs[0] if n == 1 else vecs
        return self.e_corr, self.ci


UCISD = GCISD
