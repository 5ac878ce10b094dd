"""Amplitude-driven CISD — O(N^6), matrix-free.

Analog of the reference's pyscf/ci/cisd.py (Davidson over (c0, c1, c2)
amplitudes). The singles-doubles block of (H - E_HF) in intermediate
normalization IS the coupled-cluster Jacobian at T = 0:

    r(t) = <mu|e^{-T} H e^{T}|0>  =>  r(0)_mu = <mu|H|0>,
    (dr/dt)(0)_{mu nu} = <mu|(H - E_HF)|nu>,

so the CISD matvec is one jax.jvp of the CCSD residual (gccsd_lambda._resid)
linearized at t = 0, plus the scalar couplings g = dE/dt(0) = (<0|H|mu>).
No hand-coded CI sigma equations; cost one jvp = a few CCSD-iteration
FLOPs. Doubles are packed scaled by 1/2 so the Euclidean dot equals the
physical (1/4-weighted antisymmetric-tensor) inner product and the packed
operator is symmetric for the Davidson solver.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..cc.gccsd import _spin_orbital_eris
from ..cc.gccsd_lambda import _resid, _energy
from ..lib.linalg import davidson


class CISD:
    conv_tol = 1e-9
    max_cycle = 100
    nroots = 1

    def __init__(self, mf, frozen=0):
        self._scf = mf
        self.mol = mf.mol
        self.frozen = frozen or 0
        self.e_corr = None
        self.ci = None
        self.converged = False

    @property
    def e_tot(self):
        return float(self._scf.e_tot) + float(self.e_corr)

    def kernel(self):
        eris, mo_e, nocc, spins, orbs = _spin_orbital_eris(self._scf)
        if self.frozen:
            f2 = 2 * self.frozen
            eris = eris[f2:, f2:, f2:, f2:]
            mo_e = mo_e[f2:]
            nocc -= f2
        nso = mo_e.shape[0]
        nvir = nso - nocc
        f = jnp.diag(jnp.asarray(mo_e))
        t0 = (jnp.zeros((nocc, nvir)),
              jnp.zeros((nocc, nocc, nvir, nvir)))
        g1, g2 = jax.grad(lambda a, b: _energy(a, b, f, eris),
                          argnums=(0, 1))(*t0)
        r01, r02 = _resid(*t0, f, eris)     # <mu|H|0>: (0, oovv)

        def r_of(tt):
            return _resid(tt[0], tt[1], f, eris)

        n1 = nocc * nvir
        sh2 = (nocc, nocc, nvir, nvir)
        n2 = int(np.prod(sh2))

        @jax.jit
        def matvec_dev(c):
            c0 = c[0]
            c1 = c[1:1 + n1].reshape(nocc, nvir)
            c2 = 2.0 * c[1 + n1:].reshape(sh2)      # unpack scaling
            _, (j1, j2) = jax.jvp(r_of, (t0,), (((c1, c2),)))
            s0 = jnp.sum(g1 * c1) + jnp.sum(g2 * c2)
            s1 = j1 + c0 * r01
            s2 = j2 + c0 * r02
            return jnp.concatenate([s0.reshape(1), s1.reshape(-1),
                                    0.5 * s2.reshape(-1)])

        def matvec(c):
            return np.asarray(matvec_dev(jnp.asarray(c)))

        eia = np.asarray(mo_e)[:nocc, None] - np.asarray(mo_e)[None, nocc:]
        eijab = eia[:, None, :, None] + eia[None, :, None, :]
        hdiag = np.concatenate([[0.0], -eia.ravel(), -eijab.ravel()])
        x0 = np.zeros((self.nroots, 1 + n1 + n2))
        x0[0, 0] = 1.0
        for i in range(1, self.nroots):
            x0[i, np.argsort(hdiag)[i]] = 1.0
        e, vecs, conv = davidson(matvec, x0, neig=self.nroots,
                                 tol=self.conv_tol,
                                 max_cycle=self.max_cycle, hdiag=hdiag)
        self.converged = bool(conv)
        self.e_corr = float(e[0])
        self.ci = vecs[0] if self.nroots == 1 else vecs
        return self.e_corr, self.ci

    run = kernel
