"""Spatial-orbital EOM-CCSD for closed-shell references (Davidson).

Analog of reference pyscf/cc/eom_rccsd.py (EOMEESinglet:1088, EOMIP:410,
EOMEA:731), whose sigma contractions are ~2000 lines of hand-derived
intermediates.  TPU redesign: the EOM effective Hamiltonian in the
(1h1p, 2h2p) space is the Jacobian of the spin-adapted RCCSD amplitude
residual (both equal the similarity-transformed H-bar projected on
excited determinants), so ONE forward-mode jax.jvp of ccsd.update_amps
at the converged amplitudes delivers the exact O(N^6) sigma as a single
fused XLA program — including the DF aux-chunked ladder scan, so no
(vv|vv) is ever materialized.

* EE (singlet): Jacobian on (ij)(ab)-symmetric z2 — the closed-shell
  parameterization is the singlet spin adaptation.
* IP / EA: the continuum-orbital construction.  One ghost orbital with
  zero Fock/integral elements is appended to the virtual (occupied)
  block; the padded amplitudes still solve the CCSD equations, and the
  Jacobian restricted to the ghost sector IS the IP (EA) EOM matrix:
  r1_i = z1[i,g], r2_ija = z2[i,j,a,g] (nocc^2*nvir components — the
  full doublet 2h1p space).  Eigenvalues are E(N∓1) − E_CC.

Davidson: lib/linalg.davidson_nosym with Koopmans-like unit guesses and
orbital-energy-difference diagonal preconditioning.
"""
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp

from .ccsd import update_amps
from ..lib.linalg import davidson_nosym


def _eris_tuple(eris):
    return (eris.oooo, eris.ooov, eris.oovv, eris.ovov, eris.ovvo,
            eris.ovvv, eris.vvvv, eris.Bvv, eris.mo_energy)


def _matvec_factory(t1, t2, eris_tuple):
    """z -> J z with J = d(residual)/dt at the converged amplitudes.

    residual = Delta_eps * (update_amps(t) - t); its Jacobian has
    eigenvalues equal to the EOM-CCSD excitation energies."""
    mo_e = eris_tuple[-1]
    nocc = t1.shape[0]
    eia = mo_e[:nocc, None] - mo_e[None, nocc:]
    eijab = eia[:, None, :, None] + eia[None, :, None, :]

    def resid(tt):
        u1, u2 = update_amps(tt[0], tt[1], eris_tuple)
        return ((u1 - tt[0]) * eia, (u2 - tt[1]) * eijab)

    @jax.jit
    def matvec(z1, z2):
        _, jz = jax.jvp(resid, ((t1, t2),), ((z1, z2),))
        return jz

    return matvec


def _pad_axes(a, axes):
    if a is None:
        return None
    pads = [(0, 1) if i in axes else (0, 0) for i in range(a.ndim)]
    return jnp.pad(a, pads)


def _augment_virtual(eris):
    """Append one ghost virtual (zero integrals, zero orbital energy)."""
    nocc = eris.nocc
    return SimpleNamespace(
        oooo=eris.oooo,
        ooov=_pad_axes(eris.ooov, (3,)),
        oovv=_pad_axes(eris.oovv, (2, 3)),
        ovov=_pad_axes(eris.ovov, (1, 3)),
        ovvo=_pad_axes(eris.ovvo, (1, 2)),
        ovvv=_pad_axes(eris.ovvv, (1, 2, 3)),
        vvvv=_pad_axes(eris.vvvv, (0, 1, 2, 3)),
        Bvv=_pad_axes(eris.Bvv, (2, 3)),
        mo_energy=jnp.append(eris.mo_energy, 0.0),
        nocc=nocc)


def _augment_occupied(eris):
    """Append one ghost occupied at the END of the occupied block."""
    nocc = eris.nocc
    mo_e = eris.mo_energy
    return SimpleNamespace(
        oooo=_pad_axes(eris.oooo, (0, 1, 2, 3)),
        ooov=_pad_axes(eris.ooov, (0, 1, 2)),
        oovv=_pad_axes(eris.oovv, (0, 1)),
        ovov=_pad_axes(eris.ovov, (0, 2)),
        ovvo=_pad_axes(eris.ovvo, (0, 3)),
        ovvv=_pad_axes(eris.ovvv, (0,)),
        vvvv=eris.vvvv,
        Bvv=eris.Bvv,
        mo_energy=jnp.concatenate([mo_e[:nocc], jnp.zeros(1),
                                   mo_e[nocc:]]),
        nocc=nocc + 1)


class _EOMBase:
    nstates = 3
    conv_tol = 1e-7
    max_cycle = 120
    max_space = None

    def __init__(self, cc):
        self._cc = cc
        self.e = None
        self.v = None

    def kernel(self, nstates=None):
        n = nstates or self.nstates
        matvec, hdiag, guesses = self._setup(n)
        w, v, conv = davidson_nosym(
            matvec, np.stack(guesses), neig=n, tol=self.conv_tol,
            max_cycle=self.max_cycle, hdiag=hdiag,
            max_space=self.max_space or max(6 * (n + 2), 20))
        self.e, self.v, self.converged = w, v, conv
        return self.e

    run = kernel


class EOMEESinglet(_EOMBase):
    """Singlet EE-EOM-CCSD (spatial orbitals, O(N^6) Davidson)."""

    def _setup(self, n):
        cc = self._cc
        t1, t2 = jnp.asarray(cc.t1), jnp.asarray(cc.t2)
        eris = cc._eris if cc._eris is not None else cc.ao2mo()
        et = _eris_tuple(eris)
        mv = _matvec_factory(t1, t2, et)
        nocc, nvir = t1.shape
        n1 = nocc * nvir
        mo_e = np.asarray(eris.mo_energy)
        eia = mo_e[None, nocc:] - mo_e[:nocc, None]          # > 0
        eijab = (eia[:, None, :, None] + eia[None, :, None, :])
        hdiag = np.concatenate([eia.ravel(), eijab.ravel()])

        def matvec(x):
            z1 = jnp.asarray(x[:n1].reshape(nocc, nvir))
            z2 = jnp.asarray(x[n1:].reshape(nocc, nocc, nvir, nvir))
            z2 = 0.5 * (z2 + z2.transpose(1, 0, 3, 2))   # singlet sector
            j1, j2 = mv(z1, z2)
            j2 = 0.5 * (j2 + j2.transpose(1, 0, 3, 2))
            return np.concatenate([np.asarray(j1).ravel(),
                                   np.asarray(j2).ravel()])

        # Koopmans-like singles guesses at the smallest eia
        order = np.argsort(eia.ravel())
        guesses = []
        for k in range(n + 1):
            g = np.zeros(n1 + n1 * n1)
            g[order[k]] = 1.0
            guesses.append(g)
        return matvec, hdiag, guesses


class EOMIP(_EOMBase):
    """IP-EOM-CCSD via the ghost-virtual continuum orbital (doublet)."""

    def _setup(self, n):
        cc = self._cc
        eris = cc._eris if cc._eris is not None else cc.ao2mo()
        aeris = _augment_virtual(eris)
        nocc = aeris.nocc
        nvir = aeris.mo_energy.shape[0] - nocc       # includes ghost
        nv = nvir - 1
        g = nvir - 1
        t1 = _pad_axes(jnp.asarray(cc.t1), (1,))
        t2 = _pad_axes(jnp.asarray(cc.t2), (2, 3))
        mv = _matvec_factory(t1, t2, _eris_tuple(aeris))
        mo_e = np.asarray(aeris.mo_energy)
        eo, ev = mo_e[:nocc], mo_e[nocc:nocc + nv]
        hdiag = np.concatenate([
            -eo,
            (-eo[:, None, None] - eo[None, :, None]
             + ev[None, None, :]).ravel()])

        def matvec(x):
            r1 = x[:nocc]
            r2 = x[nocc:].reshape(nocc, nocc, nv)
            z1 = jnp.zeros((nocc, nvir)).at[:, g].set(jnp.asarray(r1))
            z2 = jnp.zeros((nocc, nocc, nvir, nvir))
            z2 = z2.at[:, :, :nv, g].set(jnp.asarray(r2))
            z2 = z2.at[:, :, g, :nv].set(jnp.asarray(
                r2.transpose(1, 0, 2)))
            j1, j2 = mv(z1, z2)
            j2 = np.asarray(j2)
            j2s = 0.5 * (j2[:, :, :nv, g]
                         + j2[:, :, g, :nv].transpose(1, 0, 2))
            return np.concatenate([np.asarray(j1)[:, g], j2s.ravel()])

        order = np.argsort(-eo)          # highest occupied first
        guesses = []
        for k in range(min(n + 1, nocc)):
            gv = np.zeros(nocc + nocc * nocc * nv)
            gv[order[k]] = 1.0
            guesses.append(gv)
        return matvec, hdiag, guesses


class EOMEA(_EOMBase):
    """EA-EOM-CCSD via the ghost-occupied continuum orbital (doublet)."""

    def _setup(self, n):
        cc = self._cc
        eris = cc._eris if cc._eris is not None else cc.ao2mo()
        aeris = _augment_occupied(eris)
        nocc = aeris.nocc                 # includes ghost (last occ slot)
        nvir = aeris.mo_energy.shape[0] - nocc
        no = nocc - 1
        g = nocc - 1
        t1 = _pad_axes(jnp.asarray(cc.t1), (0,))
        t2 = _pad_axes(jnp.asarray(cc.t2), (0, 1))
        mv = _matvec_factory(t1, t2, _eris_tuple(aeris))
        mo_e = np.asarray(aeris.mo_energy)
        eo, ev = mo_e[:no], mo_e[nocc:]
        hdiag = np.concatenate([
            ev,
            (-eo[:, None, None] + ev[None, :, None]
             + ev[None, None, :]).ravel()])

        def matvec(x):
            r1 = x[:nvir]
            r2 = x[nvir:].reshape(no, nvir, nvir)
            z1 = jnp.zeros((nocc, nvir)).at[g, :].set(jnp.asarray(r1))
            z2 = jnp.zeros((nocc, nocc, nvir, nvir))
            z2 = z2.at[g, :no, :, :].set(jnp.asarray(r2))
            z2 = z2.at[:no, g, :, :].set(jnp.asarray(
                r2.transpose(0, 2, 1)))
            j1, j2 = mv(z1, z2)
            j2 = np.asarray(j2)
            j2s = 0.5 * (j2[g, :no, :, :]
                         + j2[:no, g, :, :].transpose(0, 2, 1))
            return np.concatenate([np.asarray(j1)[g, :], j2s.ravel()])

        order = np.argsort(ev)            # lowest virtual first
        guesses = []
        for k in range(min(n + 1, nvir)):
            gv = np.zeros(nvir + no * nvir * nvir)
            gv[order[k]] = 1.0
            guesses.append(gv)
        return matvec, hdiag, guesses


def eomee_ccsd_singlet(cc, nstates=3):
    eom = EOMEESinglet(cc)
    return eom.kernel(nstates), eom.v


def ipccsd(cc, nstates=3):
    eom = EOMIP(cc)
    return eom.kernel(nstates), eom.v


def eaccsd(cc, nstates=3):
    eom = EOMEA(cc)
    return eom.kernel(nstates), eom.v
