"""Quadratic CISD (QCISD) in the spin-orbital basis.

Reference analog: pyscf/cc/qcisd.py (Pople, Head-Gordon, Raghavachari,
JCP 87, 5968 (1987)). QCISD keeps, relative to CCSD:
  singles: <S|H(T1 + T2 + T1T2)|0>           (drop T1^2, T1^3, T1^2 T2)
  doubles: <D|H(1 + T1 + T2 + 1/2 T2^2)|0>   (drop every T1 product)
  energy:  E = 1/4 <ij||ab> t_ijab           (no T1^2 term)
so the update below is the SGWB CCSD iteration (cc/gccsd.py) with the
excluded contractions removed. Exact for two-electron systems, which is
the oracle used in tests/test_postscf.py.
"""
import jax
import jax.numpy as jnp

from ..lib.diis import DIIS
from .gccsd import _spin_orbital_eris


def _qcisd_energy(t2, oovv):
    return (0.25 * jnp.einsum('ijab,ijab->', oovv, t2)).real


@jax.jit
def _qcisd_update(t1, t2, eris, mo_e, nocc_arr):
    nocc = t1.shape[0]
    o = slice(0, nocc)
    v = slice(nocc, None)
    eo = mo_e[:nocc]
    ev = mo_e[nocc:]
    oovv = eris[o, o, v, v]
    ovvv = eris[o, v, v, v]
    ooov = eris[o, o, o, v]
    oooo = eris[o, o, o, o]
    vvvv = eris[v, v, v, v]
    ovov = eris[o, v, o, v]
    ovvo = eris[o, v, v, o]
    oovo = eris[o, o, v, o]
    ovoo = eris[o, v, o, o]
    vvvo = eris[v, v, v, o]

    # intermediates with every T1 product removed
    Fae = -0.5 * jnp.einsum('mnaf,mnef->ae', t2, oovv)
    Fmi = 0.5 * jnp.einsum('inef,mnef->mi', t2, oovv)
    Fme = jnp.einsum('nf,mnef->me', t1, oovv)

    Wmnij = oooo + 0.25 * jnp.einsum('ijef,mnef->mnij', t2, oovv)
    Wabef = vvvv + 0.25 * jnp.einsum('mnab,mnef->abef', t2, oovv)
    Wmbej = ovvo - 0.5 * jnp.einsum('jnfb,mnef->mbej', t2, oovv)

    # T1: linear T1/T2 plus the T1T2 cross terms
    t1new = (jnp.einsum('ie,ae->ia', t1, Fae)
             - jnp.einsum('ma,mi->ia', t1, Fmi)
             + jnp.einsum('imae,me->ia', t2, Fme)
             - jnp.einsum('nf,naif->ia', t1, ovov)
             - 0.5 * jnp.einsum('imef,maef->ia', t2, ovvv)
             - 0.5 * jnp.einsum('mnae,nmei->ia', t2, oovo))
    # T2: linear T1 (bare vvvo/ovoo) + linear and quadratic T2
    t2new = jnp.conj(oovv)
    tmp = jnp.einsum('ijae,be->ijab', t2, Fae)
    t2new = t2new + tmp - tmp.transpose(0, 1, 3, 2)
    tmp = jnp.einsum('imab,mj->ijab', t2, Fmi)
    t2new = t2new - tmp + tmp.transpose(1, 0, 2, 3)
    t2new = t2new + 0.5 * jnp.einsum('mnab,mnij->ijab', t2, Wmnij)
    t2new = t2new + 0.5 * jnp.einsum('ijef,abef->ijab', t2, Wabef)
    tmp = jnp.einsum('imae,mbej->ijab', t2, Wmbej)
    tmp = tmp - tmp.transpose(0, 1, 3, 2)
    tmp = tmp - tmp.transpose(1, 0, 2, 3)
    t2new = t2new + tmp
    tmp = jnp.einsum('ie,abej->ijab', t1, vvvo)
    t2new = t2new + tmp - tmp.transpose(1, 0, 2, 3)
    tmp = jnp.einsum('ma,mbij->ijab', t1, ovoo)
    t2new = t2new - tmp + tmp.transpose(0, 1, 3, 2)

    eia = eo[:, None] - ev[None, :]
    eijab = eia[:, None, :, None] + eia[None, :, None, :]
    return t1new / eia, t2new / eijab


class QCISD:
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
        nocc -= 2 * self.frozen
        if self.frozen:
            f2 = 2 * self.frozen
            eris = eris[f2:, f2:, f2:, f2:]
            mo_e = mo_e[f2:]
        nvir = mo_e.shape[0] - nocc
        o = slice(0, nocc)
        v = slice(nocc, None)
        eia = mo_e[:nocc, None] - mo_e[None, nocc:]
        eijab = eia[:, None, :, None] + eia[None, :, None, :]
        oovv = eris[o, o, v, v]
        t2 = jnp.conj(oovv) / eijab
        t1 = jnp.zeros((nocc, nvir), dtype=eris.dtype)
        diis = DIIS(self.diis_space)
        e_last = float(_qcisd_energy(t2, oovv))
        conv = False
        for it in range(self.max_cycle):
            t1n, t2n = _qcisd_update(t1, t2, eris, mo_e, jnp.asarray(nocc))
            normt = float(jnp.linalg.norm(t1n - t1)
                          + jnp.linalg.norm(t2n - t2))
            t1, t2 = diis.update((t1n, t2n), (t1n - t1, t2n - t2))
            e_corr = float(_qcisd_energy(t2, oovv))
            de = e_corr - e_last
            e_last = e_corr
            if self.verbose >= 4:
                print(f'QCISD cycle {it + 1} E_corr = {e_corr:.12f} '
                      f'dE = {de:.3g} |t| = {normt:.3g}')
            if abs(de) < self.conv_tol and normt < self.conv_tol_normt:
                conv = True
                break
        self.converged = conv
        self.e_corr = e_corr
        self.t1, self.t2 = t1, t2
        self._eris_so = eris
        self._mo_e_so = mo_e
        self._nocc_so = nocc
        return self.e_corr, t1, t2

    run = kernel

    def qcisd_t(self):
        """Perturbative triples on QCISD amplitudes (Raghavachari 1987):
        the CCSD(T) expression with the singles-triples coupling doubled,
        E = W(W + 2V)/D (reference lib/cc/ccsd_t.c QCIsd_t_contract)."""
        from .gccsd_t import kernel as t_kernel
        return t_kernel(self._eris_so, self._mo_e_so, self._nocc_so,
                        self.t1, self.t2, st_fac=2.0)
