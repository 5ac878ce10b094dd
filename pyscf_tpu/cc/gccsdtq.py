"""Spin-orbital CCSDTQ (analog of reference pyscf/cc/rccsdtq.py).

Same construction as cc/gccsdt.py: T1 absorbed by the nilpotent orbital
dressing, and every t2/t3/t4 working-equation coefficient determined
EXACTLY against the Fock-space oracle (tools_dev/fit_ccsdtq_equations.py;
fit residual ~1e-14 on random non-hermitian tensors, verified on unseen
larger sizes).  R1/R2/R3 reuse the certified CCSDT terms plus the T4
feedback terms; R4 carries the full linear/quadratic/cubic basis.

Cost is o^4 v^4 storage with dense einsums — usable for the reference's
own CCSDTQ regime (small molecules); CCSDTQ == FCI for 4-electron
systems is the built-in oracle (tests/test_ccsdtq.py).
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..lib.diis import DIIS
from .gccsd import _spin_orbital_eris, _gccsd_energy
from .gccsdt import _antisym2, _antisym3, _dress, _residuals


def _antisym4(x):
    """Signed sum over all permutations of (i,j,k,l) and of (a,b,c,d)."""
    from itertools import permutations

    def asym_axes(t, axes0):
        out = jnp.zeros_like(t)
        for p in permutations(range(4)):
            inv = sum(1 for a in range(4) for b in range(a + 1, 4)
                      if p[a] > p[b])
            full = list(range(8))
            for pos, q in zip(axes0, p):
                full[pos] = axes0[q]
            out = out + (-1.0) ** inv * jnp.transpose(t, full)
        return out

    x = asym_axes(x, [0, 1, 2, 3])
    x = asym_axes(x, [4, 5, 6, 7])
    return x


# coefficients from tools_dev/fit_ccsdtq_equations.py (exact rationals;
# R2/R3 t4-feedback verified on unseen sizes to 3e-14)


def _r4_and_feedback(fd, wd, t2, t3, t4, nocc):
    """T4 feedback into (r2, r3) and the full R4 residual."""
    o = slice(0, nocc)
    v = slice(nocc, None)
    f_ov = fd[o, v]
    f_vv, f_oo = fd[v, v], fd[o, o]
    w_oovv = wd[o, o, v, v]
    w_ovvv = wd[o, v, v, v]
    w_ooov = wd[o, o, o, v]
    w_vvvo = wd[v, v, v, o]
    w_ovoo = wd[o, v, o, o]
    w_vvvv = wd[v, v, v, v]
    w_oooo = wd[o, o, o, o]
    w_ovvo = wd[o, v, v, o]
    ein = jnp.einsum
    C = COEFFS

    r2_t4 = _antisym2(
        C['r2_t4_w'] * ein('mnef,ijmnabef->ijab', w_oovv, t4))

    b3 = (C['r3_t4_f'] * ein('me,ijkmabce->ijkabc', f_ov, t4)
          + C['r3_t4_wv'] * ein('maef,ijkmbcef->ijkabc', w_ovvv, t4)
          + C['r3_t4_wo'] * ein('mnie,jkmnabce->ijkabc', w_ooov, t4))
    r3_t4 = _antisym3(b3)

    b4 = (C['L3v'] * ein('abei,jklcde->ijklabcd', w_vvvo, t3)
          + C['L3o'] * ein('majk,ilmbcd->ijklabcd', w_ovoo, t3)
          + C['L4fv'] * ein('ae,ijklebcd->ijklabcd', f_vv, t4)
          + C['L4fo'] * ein('mi,mjklabcd->ijklabcd', f_oo, t4)
          + C['L4vv'] * ein('abef,ijklefcd->ijklabcd', w_vvvv, t4)
          + C['L4oo'] * ein('mnij,mnklabcd->ijklabcd', w_oooo, t4)
          + C['L4ov'] * ein('maei,mjklebcd->ijklabcd', w_ovvo, t4)
          + C['QA1'] * ein('maef,ijbe,klmcdf->ijklabcd', w_ovvv, t2, t3)
          + C['QA2'] * ein('maef,imbc,jkldef->ijklabcd', w_ovvv, t2, t3)
          + C['QA3'] * ein('maef,ijef,klmbcd->ijklabcd', w_ovvv, t2, t3)
          + C['QA4'] * ein('maef,imbe,jklcdf->ijklabcd', w_ovvv, t2, t3)
          + C['QB1'] * ein('mnie,jmab,klncde->ijklabcd', w_ooov, t2, t3)
          + C['QB2'] * ein('mnie,jkae,lmnbcd->ijklabcd', w_ooov, t2, t3)
          + C['QB3'] * ein('mnie,mnab,jklcde->ijklabcd', w_ooov, t2, t3)
          + C['QB4'] * ein('mnie,jmae,klnbcd->ijklabcd', w_ooov, t2, t3)
          + C['QF1'] * ein('me,ijae,klmbcd->ijklabcd', f_ov, t2, t3)
          + C['QF2'] * ein('me,imab,jklcde->ijklabcd', f_ov, t2, t3)
          + C['QT1'] * ein('mnef,imnabc,jkldef->ijklabcd', w_oovv, t3, t3)
          + C['QT2'] * ein('mnef,ijmabe,klncdf->ijklabcd', w_oovv, t3, t3)
          + C['QT3'] * ein('mnef,imnabe,jklcdf->ijklabcd', w_oovv, t3, t3)
          + C['QT4'] * ein('mnef,ijmaef,klnbcd->ijklabcd', w_oovv, t3, t3)
          + C['QQ1'] * ein('mnef,ijae,klmnbcdf->ijklabcd', w_oovv, t2, t4)
          + C['QQ2'] * ein('mnef,imab,jklncdef->ijklabcd', w_oovv, t2, t4)
          + C['QQ3'] * ein('mnef,ijef,klmnabcd->ijklabcd', w_oovv, t2, t4)
          + C['QQ4'] * ein('mnef,mnab,ijklcdef->ijklabcd', w_oovv, t2, t4)
          + C['QQ5'] * ein('mnef,imae,jklnbcdf->ijklabcd', w_oovv, t2, t4)
          + C['QQ6'] * ein('mnef,mnaf,ijklbcde->ijklabcd', w_oovv, t2, t4)
          + C['QQ7'] * ein('mnef,imef,jklnabcd->ijklabcd', w_oovv, t2, t4)
          + C['C1'] * ein('mnef,ijef,kmab,lncd->ijklabcd',
                          w_oovv, t2, t2, t2)
          + C['C2'] * ein('mnef,mnab,ijce,kldf->ijklabcd',
                          w_oovv, t2, t2, t2)
          + C['C3'] * ein('mnef,imae,jnbc,kldf->ijklabcd',
                          w_oovv, t2, t2, t2)
          + C['D1'] * ein('abef,ijce,kldf->ijklabcd', w_vvvv, t2, t2)
          + C['D2'] * ein('mnij,kmab,lncd->ijklabcd', w_oooo, t2, t2)
          + C['D3'] * ein('maei,jmbc,klde->ijklabcd', w_ovvo, t2, t2))
    r4 = _antisym4(b4)
    return r2_t4, r3_t4, r4


# Exact coefficients from the oracle fit (see module docstring); the
# CCSDT subset lives in gccsdt._residuals.
COEFFS = {
    'r2_t4_w': 1.0 / 16.0,
    'r3_t4_f': 1.0 / 36.0,
    'r3_t4_wv': -1.0 / 24.0,
    'r3_t4_wo': -1.0 / 24.0,
    # R4 (fit residual 3.4e-14, verify on unseen sizes 3.2e-14, rank 34/34)
    'L3v': -1.0 / 24.0,
    'L3o': 1.0 / 24.0,
    'L4fv': 1.0 / 144.0,
    'L4fo': -1.0 / 144.0,
    'L4vv': 1.0 / 192.0,
    'L4oo': 1.0 / 192.0,
    'L4ov': 1.0 / 36.0,
    'QA1': 1.0 / 8.0,
    'QA2': -1.0 / 24.0,
    'QA3': 1.0 / 48.0,
    'QA4': -1.0 / 12.0,
    'QB1': 1.0 / 8.0,
    'QB2': -1.0 / 24.0,
    'QB3': 1.0 / 48.0,
    'QB4': -1.0 / 12.0,
    'QF1': -1.0 / 24.0,
    'QF2': -1.0 / 24.0,
    'QT1': 1.0 / 144.0,
    'QT2': 1.0 / 32.0,
    'QT3': 1.0 / 48.0,
    'QT4': 1.0 / 48.0,
    'QQ1': -1.0 / 48.0,
    'QQ2': -1.0 / 48.0,
    'QQ3': 1.0 / 384.0,
    'QQ4': 1.0 / 384.0,
    'QQ5': 1.0 / 36.0,
    'QQ6': 1.0 / 288.0,
    'QQ7': -1.0 / 288.0,
    'C1': -1.0 / 32.0,
    'C2': -1.0 / 32.0,
    'C3': 1.0 / 4.0,
    'D1': -1.0 / 16.0,
    'D2': -1.0 / 16.0,
    'D3': 1.0 / 4.0,
}


@jax.jit
def _ccsdtq_step(h, w, mo_e, t1, t2, t3, t4):
    nocc = t1.shape[0]
    o = slice(0, nocc)
    hd, wd = _dress(h, w, t1)
    fd = hd + jnp.einsum('piqi->pq', wd[:, o, :, o])
    r1, r2, r3 = _residuals(fd, wd, t2, t3, nocc)
    r2_t4, r3_t4, r4 = _r4_and_feedback(fd, wd, t2, t3, t4, nocc)
    r2 = r2 + r2_t4
    r3 = r3 + r3_t4
    eia = mo_e[:nocc, None] - mo_e[None, nocc:]
    e2 = eia[:, None, :, None] + eia[None, :, None, :]
    e3 = (eia[:, None, None, :, None, None]
          + eia[None, :, None, None, :, None]
          + eia[None, None, :, None, None, :])
    e4 = (eia[:, None, None, None, :, None, None, None]
          + eia[None, :, None, None, None, :, None, None]
          + eia[None, None, :, None, None, None, :, None]
          + eia[None, None, None, :, None, None, None, :])
    return (t1 + r1 / eia, t2 + r2 / e2, t3 + r3 / e3, t4 + r4 / e4)


class GCCSDTQ:
    """Full CCSDTQ in the spin-orbital basis (== FCI for 4 electrons)."""

    conv_tol = 1e-8
    conv_tol_normt = 1e-6
    max_cycle = 100
    diis_space = 6

    def __init__(self, mf, frozen=0):
        self._scf = mf
        self.mol = mf.mol
        self.verbose = mf.mol.verbose
        self.frozen = frozen or 0
        self.converged = False
        self.e_corr = None

    @property
    def e_tot(self):
        return float(self._scf.e_tot) + float(self.e_corr)

    def kernel(self):
        from .gccsdt import _e_corr_dressed
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
        h = jnp.diag(mo_e) - jnp.einsum('piqi->pq', eris[:, o, :, o])
        eia = mo_e[:nocc, None] - mo_e[None, nocc:]
        eijab = eia[:, None, :, None] + eia[None, :, None, :]
        oovv = eris[o, o, v, v]
        t1 = jnp.zeros((nocc, nvir), dtype=eris.dtype)
        t2 = jnp.conj(oovv) / eijab
        t3 = jnp.zeros((nocc,) * 3 + (nvir,) * 3, dtype=eris.dtype)
        t4 = jnp.zeros((nocc,) * 4 + (nvir,) * 4, dtype=eris.dtype)
        diis = DIIS(self.diis_space)
        e_last = float(_gccsd_energy(t1, t2, oovv).real)
        conv = False
        for it in range(self.max_cycle):
            t1n, t2n, t3n, t4n = _ccsdtq_step(h, eris, mo_e, t1, t2, t3, t4)
            normt = float(jnp.linalg.norm(t1n - t1)
                          + jnp.linalg.norm(t2n - t2)
                          + jnp.linalg.norm(t3n - t3)
                          + jnp.linalg.norm(t4n - t4))
            t1, t2, t3, t4 = diis.update(
                (t1n, t2n, t3n, t4n),
                (t1n - t1, t2n - t2, t3n - t3, t4n - t4))
            e_corr = float(_e_corr_dressed(h, eris, mo_e, t1, t2).real)
            de = e_corr - e_last
            e_last = e_corr
            if self.verbose >= 4:
                print(f'CCSDTQ cycle {it + 1} E_corr = {e_corr:.12f} '
                      f'dE = {de:.3g} |t| = {normt:.3g}')
            if abs(de) < self.conv_tol and normt < self.conv_tol_normt:
                conv = True
                break
        self.converged = conv
        self.e_corr = e_corr
        self.t1, self.t2, self.t3, self.t4 = t1, t2, t3, t4
        return self.e_corr

    run = kernel


CCSDTQ = GCCSDTQ
