"""Brueckner coupled-cluster doubles (BCCD).

Reference analog: pyscf/cc/bccd.py (bccd_kernel_:132, get_umat_from_t1:30).
Outer loop: solve CCSD in the current orbitals, rotate by
expm([[0,-t1],[t1+,0]]) so the singles vanish, repeat; at convergence
|t1| ~ 0 and the doubles energy in the Brueckner basis is E(BCCD).
The cumulative rotation generator is DIIS-accelerated with t1 as the
error signal (reference: adiis.update(A, xerr=t1)).

The rotated orbitals are NOT semicanonicalized (eigenvector phase and
ordering jumps would make the DIIS vectors inconsistent); instead the
inner spin-orbital CCSD takes the full non-diagonal Fock: the SGWB
intermediates gain Fae += fvv_off, Fmi += foo_off, Fme += fov and the
singles their fov driving term (_noncanon_extra below).
"""
import numpy as np
import scipy.linalg
import jax
import jax.numpy as jnp

from ..lib.diis import DIIS
from .gccsd import _spin_orbital_eris, _gccsd_update


@jax.jit
def _noncanon_extra(t1, t2, foo_off, fvv_off, fov):
    """Additions to the (t1new, t2new) numerators for a non-diagonal f."""
    Fae_x = fvv_off - 0.5 * jnp.einsum('me,ma->ae', fov, t1)
    Fmi_x = foo_off + 0.5 * jnp.einsum('me,ie->mi', fov, t1)
    dt1 = (jnp.conj(fov)
           + jnp.einsum('ie,ae->ia', t1, Fae_x)
           - jnp.einsum('ma,mi->ia', t1, Fmi_x)
           + jnp.einsum('imae,me->ia', t2, fov))
    # Fae_mod/Fmi_mod: the cc_F fov piece and the explicit -1/2 t1.Fme
    # modification each contribute -1/2 t1.fov
    Fae_mod_x = fvv_off - jnp.einsum('mb,me->be', t1, fov)
    Fmi_mod_x = foo_off + jnp.einsum('je,me->mj', t1, fov)
    tmp = jnp.einsum('ijae,be->ijab', t2, Fae_mod_x)
    dt2 = tmp - tmp.transpose(0, 1, 3, 2)
    tmp = jnp.einsum('imab,mj->ijab', t2, Fmi_mod_x)
    dt2 = dt2 - tmp + tmp.transpose(1, 0, 2, 3)
    return dt1, dt2


class _ShimMF:
    def __init__(self, mf, mo, mo_e, mo_occ):
        self.mol = mf.mol
        self.mo_coeff = mo
        self.mo_energy = mo_e
        self.mo_occ = mo_occ
        self._eri = mf._eri
        self.e_tot = mf.e_tot


def _so_matrix(f_sp, spins, orbs):
    """Embed a spatial MO matrix into the sorted spin-orbital basis."""
    same = spins[:, None] == spins[None, :]
    return f_sp[np.ix_(orbs, orbs)] * same


def _ccsd_noncanon(shim, f_sp, conv_tol=1e-9, conv_tol_normt=1e-7,
                   max_cycle=150):
    """Spin-orbital CCSD with a full (non-diagonal) Fock matrix.

    Returns (t1_spatial, e_tot, e_corr); the energy includes the f.t1
    reference-relaxation term."""
    eris, mo_e, nocc, spins, orbs = _spin_orbital_eris(shim)
    nvir = mo_e.shape[0] - nocc
    o = slice(0, nocc)
    v = slice(nocc, None)
    eia = mo_e[:nocc, None] - mo_e[None, nocc:]
    eijab = eia[:, None, :, None] + eia[None, :, None, :]
    oovv = eris[o, o, v, v]
    f_so = _so_matrix(np.asarray(f_sp), np.asarray(spins), np.asarray(orbs))
    fov = jnp.asarray(f_so[:nocc, nocc:])
    foo_off = jnp.asarray(f_so[:nocc, :nocc]
                          - np.diag(np.asarray(mo_e[:nocc])))
    fvv_off = jnp.asarray(f_so[nocc:, nocc:]
                          - np.diag(np.asarray(mo_e[nocc:])))
    t2 = jnp.conj(oovv) / eijab
    t1 = fov / eia
    diis = DIIS(6)
    e_last = 0.0
    e_corr = 0.0
    for it in range(max_cycle):
        t1n, t2n = _gccsd_update(t1, t2, eris, mo_e, jnp.asarray(nocc))
        dt1, dt2 = _noncanon_extra(t1, t2, foo_off, fvv_off, fov)
        t1n = t1n + dt1 / eia
        t2n = t2n + dt2 / eijab
        normt = float(jnp.linalg.norm(t1n - t1) + jnp.linalg.norm(t2n - t2))
        t1, t2 = diis.update((t1n, t2n), (t1n - t1, t2n - t2))
        e_corr = float((0.25 * jnp.einsum('ijab,ijab->', oovv, t2)
                        + 0.5 * jnp.einsum('ijab,ia,jb->', oovv, t1, t1)
                        + jnp.einsum('ia,ia->', fov, t1)).real)
        if abs(e_corr - e_last) < conv_tol and normt < conv_tol_normt:
            e_last = e_corr
            break
        e_last = e_corr
    # spatial t1 averaged over the (identical) alpha/beta blocks
    nocc_sp, nvir_sp = f_sp.shape[0] // 1, 0  # shapes resolved below
    no_sp = int((np.asarray(shim.mo_occ) > 0).sum())
    nmo_sp = f_sp.shape[0]
    nv_sp = nmo_sp - no_sp
    t1sp = np.zeros((no_sp, nv_sp))
    cnt = np.zeros_like(t1sp)
    t1np = np.asarray(t1)
    for i in range(nocc):
        for a in range(nvir):
            P, Q = i, nocc + a
            if spins[P] == spins[Q]:
                io, av = orbs[P], orbs[Q] - no_sp
                if 0 <= av < nv_sp and io < no_sp:
                    t1sp[io, av] += t1np[i, a]
                    cnt[io, av] += 1
    t1sp = t1sp / np.maximum(cnt, 1)
    return t1sp, float(shim.e_tot) + e_corr, e_corr


def bccd_kernel_(mycc, conv_tol_normu=1e-5, max_cycle=20, verbose=None):
    """Brueckner loop over a CCSD object's RHF reference.
    Returns (e_tot, max|t1|, brueckner mo_coeff)."""
    mf = mycc._scf
    mol = mf.mol
    verbose = mol.verbose if verbose is None else verbose
    s = np.asarray(mol.intor('int1e_ovlp'))
    c0 = np.asarray(mf.mo_coeff)
    e0 = np.asarray(mf.mo_energy)
    f_ao = s @ (c0 * e0[None, :]) @ c0.T @ s
    occ0 = np.asarray(mf.mo_occ)
    nocc_sp = int((occ0 > 0).sum())
    nmo = c0.shape[1]
    mo = c0.copy()
    e_tot = None
    normt1 = None
    diis = DIIS(6)
    for cyc in range(max_cycle):
        f_mo = mo.T @ f_ao @ mo
        shim = _ShimMF(mf, mo, np.diag(f_mo).copy(), occ0)
        t1sp, e_tot, e_corr = _ccsd_noncanon(shim, f_mo)
        normt1 = float(np.abs(t1sp).max())
        if verbose >= 4:
            print(f'BCCD cycle {cyc + 1}: E = {e_tot:.12f} '
                  f'max|t1| = {normt1:.3e}')
        if normt1 < conv_tol_normu:
            break
        amat = np.zeros((nmo, nmo))
        amat[:nocc_sp, nocc_sp:] = -t1sp
        amat[nocc_sp:, :nocc_sp] = t1sp.T
        u_total = c0.T @ s @ mo @ scipy.linalg.expm(amat)
        if np.linalg.det(u_total) < 0:
            u_total[:, 0] *= -1
        A = np.real(scipy.linalg.logm(u_total))
        A = diis.update(A, t1sp.ravel())
        mo = c0 @ np.real(scipy.linalg.expm(np.asarray(A)))
    mycc.t1_norm = normt1
    mycc.mo_coeff_bccd = mo
    mycc.e_tot_bccd = e_tot
    return e_tot, normt1, mo
