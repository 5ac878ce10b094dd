"""Spin-orbital CCSDT (covers RHF/UHF/GHF references via GCC machinery).

Analog of reference pyscf/cc/rccsdt.py (RCCSDT, new in PySCF 2.14), built
TPU-first as one jitted residual program over T1-DRESSED integrals:

  * T1 is absorbed exactly into the Hamiltonian by the nilpotent orbital
    dressing  h~ = (1-M) h (1+M),  W~ dressed likewise per index
    (M[a,i] = t1[i,a]; same device transform the reference performs in
    rccsdt.py update_xy/update_eris), so the residuals contain no
    explicit t1 terms.
  * The t2/t3 working equations were NOT transcribed: every contraction
    pattern was enumerated from connected-diagram line counting and its
    coefficient determined EXACTLY by least squares against the
    Fock-space oracle (cc/fock_oracle.py, tools_dev/fit_cc_equations.py)
    — the fit reproduces e^{-T}He^{T}|0> projections to 1e-14 on random
    non-hermitian tensors of multiple sizes, which certifies the
    equations including all quadratic T2*T2 and T2*T3 terms.

Validation: H2O/6-31G e_corr golden -0.1364767434621007 (reference
cc/test/test_rccsdt.py:79) and CCSDT==FCI identities (tests/test_ccsdt.py).
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..lib.diis import DIIS
from .gccsd import _spin_orbital_eris, _gccsd_energy


def _antisym2(x):
    """Signed sum over permutations of (i,j) and (a,b) for x[ijab]."""
    x = x - x.transpose(1, 0, 2, 3)
    x = x - x.transpose(0, 1, 3, 2)
    return x


def _antisym3(x):
    """Signed sum over permutations of (i,j,k) and (a,b,c) for x[ijkabc]."""
    x = (x - x.transpose(1, 0, 2, 3, 4, 5)
         + x.transpose(1, 2, 0, 3, 4, 5)
         - x.transpose(2, 1, 0, 3, 4, 5)
         + x.transpose(2, 0, 1, 3, 4, 5)
         - x.transpose(0, 2, 1, 3, 4, 5))
    x = (x - x.transpose(0, 1, 2, 4, 3, 5)
         + x.transpose(0, 1, 2, 4, 5, 3)
         - x.transpose(0, 1, 2, 5, 4, 3)
         + x.transpose(0, 1, 2, 5, 3, 4)
         - x.transpose(0, 1, 2, 3, 5, 4))
    return x


def _dress(h, w, t1):
    """T1-similarity-transformed (h~, w~): exact absorption of T1."""
    nocc, nvir = t1.shape
    n = nocc + nvir
    m = jnp.zeros((n, n), dtype=t1.dtype).at[nocc:, :nocc].set(t1.T)
    x = jnp.eye(n, dtype=t1.dtype) - m          # bra (creation) dressing
    y = jnp.eye(n, dtype=t1.dtype) + m.T        # ket (annihilation) dressing
    hd = x @ h @ y.T
    wd = jnp.einsum('Pp,pqrs->Pqrs', x, w)
    wd = jnp.einsum('Qq,Pqrs->PQrs', x, wd)
    wd = jnp.einsum('Rr,PQrs->PQRs', y, wd)
    wd = jnp.einsum('Ss,PQRs->PQRS', y, wd)
    return hd, wd


def _residuals(fd, wd, t2, t3, nocc):
    """(r1, r2, r3): oracle-certified spin-orbital CCSDT residuals.

    fd/wd are the T1-dressed normal-ordered Fock and antisymmetrized
    <pq||rs>.  Coefficients from tools_dev/fit_cc_equations.py (exact
    rationals, fit residual ~1e-14, verified on unseen problem sizes).
    """
    o = slice(0, nocc)
    v = slice(nocc, None)
    f_oo, f_ov = fd[o, o], fd[o, v]
    f_vo, f_vv = fd[v, o], fd[v, v]
    w_oovv = wd[o, o, v, v]
    w_vvoo = wd[v, v, o, o]
    w_ovvv = wd[o, v, v, v]
    w_vovv = wd[v, o, v, v]
    w_oovo = wd[o, o, v, o]
    w_ooov = wd[o, o, o, v]
    w_vvvv = wd[v, v, v, v]
    w_oooo = wd[o, o, o, o]
    w_ovvo = wd[o, v, v, o]
    w_vvvo = wd[v, v, v, o]
    w_ovoo = wd[o, v, o, o]
    ein = jnp.einsum

    r1 = (f_vo.T
          + ein('me,imae->ia', f_ov, t2)
          - 0.5 * ein('maef,imef->ia', w_ovvv, t2)
          + 0.5 * ein('mnei,mnae->ia', w_oovo, t2)
          + 0.25 * ein('mnef,imnaef->ia', w_oovv, t3))

    b2 = (0.25 * ein('abij->ijab', w_vvoo)
          + 0.5 * ein('be,ijae->ijab', f_vv, t2)
          - 0.5 * ein('mj,imab->ijab', f_oo, t2)
          + 0.125 * ein('abef,ijef->ijab', w_vvvv, t2)
          + 0.125 * ein('mnij,mnab->ijab', w_oooo, t2)
          + ein('mbej,imae->ijab', w_ovvo, t2)
          + 0.25 * ein('me,ijmabe->ijab', f_ov, t3)
          + 0.25 * ein('bmef,ijmaef->ijab', w_vovv, t3)
          - 0.25 * ein('mnje,imnabe->ijab', w_ooov, t3)
          + 0.0625 * ein('mnef,ijef,mnab->ijab', w_oovv, t2, t2)
          + 0.5 * ein('mnef,imae,jnbf->ijab', w_oovv, t2, t2)
          + 0.25 * ein('mnef,mnaf,ijbe->ijab', w_oovv, t2, t2)
          - 0.25 * ein('mnef,imef,jnab->ijab', w_oovv, t2, t2))
    r2 = _antisym2(b2)

    c24 = 1.0 / 24.0
    c48 = 1.0 / 48.0
    b3 = (0.25 * ein('bcei,jkae->ijkabc', w_vvvo, t2)
          - 0.25 * ein('majk,imbc->ijkabc', w_ovoo, t2)
          + (1.0 / 12.0) * ein('ae,ijkebc->ijkabc', f_vv, t3)
          - (1.0 / 12.0) * ein('mi,mjkabc->ijkabc', f_oo, t3)
          + c24 * ein('abef,ijkefc->ijkabc', w_vvvv, t3)
          + c24 * ein('mnij,mnkabc->ijkabc', w_oooo, t3)
          + 0.25 * ein('maei,mjkebc->ijkabc', w_ovvo, t3)
          + 0.5 * ein('maef,imbe,jkcf->ijkabc', w_ovvv, t2, t2)
          - 0.125 * ein('maef,ijef,kmbc->ijkabc', w_ovvv, t2, t2)
          + 0.5 * ein('mnie,jmae,knbc->ijkabc', w_ooov, t2, t2)
          - 0.125 * ein('mnie,mnab,jkce->ijkabc', w_ooov, t2, t2)
          + 0.25 * ein('me,ijae,kmbc->ijkabc', f_ov, t2, t2)
          - c24 * ein('mnef,mnaf,ijkebc->ijkabc', w_oovv, t2, t3)
          + c24 * ein('mnef,imef,njkabc->ijkabc', w_oovv, t2, t3)
          + c48 * ein('mnef,ijef,mnkabc->ijkabc', w_oovv, t2, t3)
          + c48 * ein('mnef,mnab,ijkefc->ijkabc', w_oovv, t2, t3)
          + 0.25 * ein('mnef,imae,njkfbc->ijkabc', w_oovv, t2, t3)
          + 0.125 * ein('mnef,ijae,mnkfbc->ijkabc', w_oovv, t2, t3)
          + 0.125 * ein('mnef,imab,njkefc->ijkabc', w_oovv, t2, t3))
    r3 = _antisym3(b3)
    return r1, r2, r3


@jax.jit
def _ccsdt_step(h, w, mo_e, t1, t2, t3):
    nocc = t1.shape[0]
    o = slice(0, nocc)
    hd, wd = _dress(h, w, t1)
    fd = hd + jnp.einsum('piqi->pq', wd[:, o, :, o])
    r1, r2, r3 = _residuals(fd, wd, t2, t3, nocc)
    eia = mo_e[:nocc, None] - mo_e[None, nocc:]
    eijab = eia[:, None, :, None] + eia[None, :, None, :]
    eijkabc = (eia[:, None, None, :, None, None]
               + eia[None, :, None, None, :, None]
               + eia[None, None, :, None, None, :])
    return t1 + r1 / eia, t2 + r2 / eijab, t3 + r3 / eijkabc


@jax.jit
def _e_corr_dressed(h, w, mo_e, t1, t2):
    """E_corr = <0|e^{-T}He^{T}|0> - E_HF via the dressed Hamiltonian."""
    nocc = t1.shape[0]
    o = slice(0, nocc)
    v = slice(nocc, None)
    hd, wd = _dress(h, w, t1)
    e_ref_d = (jnp.einsum('ii->', hd[o, o])
               + 0.5 * jnp.einsum('ijij->', wd[o, o, o, o]))
    e_hf = (jnp.einsum('ii->', h[o, o])
            + 0.5 * jnp.einsum('ijij->', w[o, o, o, o]))
    return e_ref_d - e_hf + 0.25 * jnp.einsum('ijab,ijab->',
                                              wd[o, o, v, v], t2)


class GCCSDT:
    """Full CCSDT in the spin-orbital basis.

    Usage: GCCSDT(mf).kernel() — mf is a converged RHF/UHF/GHF mean
    field; e_corr matches reference RCCSDT/UCCSDT."""

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
        # bare one-body part of the normal-ordered Hamiltonian
        h = jnp.diag(mo_e) - jnp.einsum('piqi->pq', eris[:, o, :, o])
        eia = mo_e[:nocc, None] - mo_e[None, nocc:]
        eijab = eia[:, None, :, None] + eia[None, :, None, :]
        oovv = eris[o, o, v, v]
        t1 = jnp.zeros((nocc, nvir), dtype=eris.dtype)
        t2 = jnp.conj(oovv) / eijab
        t3 = jnp.zeros((nocc,) * 3 + (nvir,) * 3, dtype=eris.dtype)
        diis = DIIS(self.diis_space)
        e_last = float(_gccsd_energy(t1, t2, oovv).real)
        conv = False
        for it in range(self.max_cycle):
            t1n, t2n, t3n = _ccsdt_step(h, eris, mo_e, t1, t2, t3)
            normt = float(jnp.linalg.norm(t1n - t1)
                          + jnp.linalg.norm(t2n - t2)
                          + jnp.linalg.norm(t3n - t3))
            t1, t2, t3 = diis.update((t1n, t2n, t3n),
                                     (t1n - t1, t2n - t2, t3n - t3))
            e_corr = float(_e_corr_dressed(h, eris, mo_e, t1, t2).real)
            de = e_corr - e_last
            e_last = e_corr
            if self.verbose >= 4:
                print(f'CCSDT cycle {it + 1} E_corr = {e_corr:.12f} '
                      f'dE = {de:.3g} |t| = {normt:.3g}')
            if abs(de) < self.conv_tol and normt < self.conv_tol_normt:
                conv = True
                break
        self.converged = conv
        self.e_corr = e_corr
        self.t1, self.t2, self.t3 = t1, t2, t3
        return self.e_corr

    run = kernel


CCSDT = GCCSDT
