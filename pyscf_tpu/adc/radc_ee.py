"""EE-ADC(2): excitation energies via the algebraic diagrammatic
construction, spin-orbital formulation.

Reference analog: pyscf/adc/radc_ee.py (restricted spin-adapted); the
spin-orbital secular matrix covers singlets and triplets in one
spectrum. Blocks (strict ADC(2)):

  ph/ph     : (ea-ei) d d + <aj||ib> + M2 (static-self-energy-like)
  ph/2p2h   : first-order Coulomb coupling (4 delta terms)
  2p2h/2p2h : diagonal orbital-energy differences

Doubles are stored full-antisymmetric and scaled by 1/2 so the Davidson
metric is the standard dot product. Validation status: the ADC(1) limit
reproduces CIS exactly (dense comparison, 1e-16); the secular matrix is
Hermitian to machine precision; the coupling-block signs are pinned by
explicit second quantization. Known deviation: the full ADC(2) spectrum
sits ~3-5 mHa below the reference H2O/cc-pVDZ goldens — the
second-order ph/ph weights need the remaining exchange-type terms of the
reference's spin-adapted expansion (radc_ee.py:93-117); tracked in
tests/test_adc_ee.py with the current tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..cc.gccsd import _spin_orbital_eris
from ..lib.linalg import davidson


class ADC2EE:
    nroots = 4
    conv_tol = 1e-7
    max_cycle = 120
    method = 'adc(2)'       # 'adc(1)' drops M2 + coupling (= CIS)
    # experimentation knobs for the second-order ph/ph weights (the
    # documented ~5 mHa deviation is invariant under any single (x, t)
    # rescaling -- the missing piece is additional exchange-type term
    # shapes, not coefficients; see module docstring)
    m2_x = 1.0              # coefficient of the delta-type M2 terms
    m2_t = -1.0             # coefficient of the cross M2 term

    def __init__(self, mf, frozen=0):
        self._scf = mf
        self.mol = mf.mol
        self.frozen = frozen or 0
        self.e = None

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
        eo = mo_e[:nocc]
        ev = mo_e[nocc:]
        oovv = eris[o, o, v, v]
        ovov = eris[o, v, o, v]
        ooov = eris[o, o, o, v]
        ovvv = eris[o, v, v, v]
        eia = eo[:, None] - ev[None, :]
        dijab = (eia[:, None, :, None] + eia[None, :, None, :])
        t2 = oovv / dijab
        first_order = self.method == 'adc(1)'
        if first_order:
            t2 = t2 * 0.0

        # second-order ph/ph intermediates (symmetric):
        #   M2 = +1/4 d_ij [t v + v t]_ab + 1/4 d_ab [t v + v t]_ij
        #        -1/2 [t_ikac v_jkbc + v_ikac t_jkbc]
        Xvv = 0.25 * (jnp.einsum('klac,klbc->ab', t2, oovv)
                      + jnp.einsum('klac,klbc->ab', oovv, t2))
        Yoo = 0.25 * (jnp.einsum('ikcd,jkcd->ij', t2, oovv)
                      + jnp.einsum('ikcd,jkcd->ij', oovv, t2))

        n1 = nocc * nvir

        @jax.jit
        def matvec(x):
            r1 = x[:n1].reshape(nocc, nvir)
            y2 = x[n1:].reshape(nocc, nocc, nvir, nvir)
            # project onto the physical (antisymmetric) 2p2h subspace;
            # spurious symmetric components are shifted far up so they
            # never pollute the low spectrum
            y2a = 0.25 * (y2 - y2.transpose(1, 0, 2, 3)
                          - y2.transpose(0, 1, 3, 2)
                          + y2.transpose(1, 0, 3, 2))
            spur = y2 - y2a
            r2 = 2.0 * y2a
            # ph <- ph
            s1 = -eia * r1
            s1 += jnp.einsum('ajib,jb->ia', eris[v, o, o, v], r1)
            # M2 terms
            s1 += self.m2_x * jnp.einsum('ab,ib->ia', Xvv, r1)
            s1 += self.m2_x * jnp.einsum('ij,ja->ia', Yoo, r1)
            tmp = 0.5 * (jnp.einsum('ikac,jkbc->iajb', t2, oovv)
                         + jnp.einsum('ikac,jkbc->iajb', oovv, t2))
            s1 += self.m2_t * jnp.einsum('iajb,jb->ia', tmp, r1)
            # ph <- 2p2h: C = -<kl||id> d_ac + <kl||ic> d_ad
            #             + <al||cd> d_ik - <ak||cd> d_il
            # (signs pinned against explicit second quantization); over the
            # full antisym storage the 4 terms collapse to 2 with factor 1/2
            vovv = eris[v, o, v, v]
            if not first_order:
                s1 += (-0.5 * jnp.einsum('klid,klad->ia', ooov, r2)
                       + 0.5 * jnp.einsum('alcd,ilcd->ia', vovv, r2))
            # 2p2h <- ph (adjoint of C) + diagonal
            s2 = -dijab * r2
            if not first_order:
                x1 = jnp.einsum('klid,ic->klcd', ooov, r1)
                x1 = -(x1 - x1.transpose(0, 1, 3, 2))
                y1 = jnp.einsum('alcd,ka->klcd', vovv, r1)
                y1 = y1 - y1.transpose(1, 0, 2, 3)
                s2 = s2 + x1 + y1
            s2y = 0.5 * s2 + 1e3 * spur
            return jnp.concatenate([s1.ravel(), s2y.ravel()])

        hd1 = np.asarray(-eia).ravel()
        hd2 = np.asarray(-dijab).ravel()
        hdiag = np.concatenate([hd1, hd2])
        x0 = np.zeros((max(n + 2, 4), hdiag.size))
        order = np.argsort(hd1)
        for i in range(x0.shape[0]):
            x0[i, order[i % len(order)]] = 1.0
        w, vecs, conv = davidson(lambda z: np.asarray(matvec(jnp.asarray(z))),
                                 x0, neig=n, max_cycle=self.max_cycle,
                                 tol=self.conv_tol, hdiag=hdiag)
        self.e = np.asarray(w)[:n]
        self.converged = conv
        return self.e
