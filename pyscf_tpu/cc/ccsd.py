"""Closed-shell CCSD (analog of reference pyscf/cc/ccsd.py: CCSD:1265,
kernel:44, update_amps:104; DF variant of cc/dfccsd.py).

Amplitude equations are the spin-adapted closed-shell CCSD equations of
Hirata et al., JCP 120, 2581 (2004), Eqs. (35)-(45), implemented as one
jitted XLA program per iteration (dense MXU contractions over MO-block
tensors held in HBM). With density fitting the (vv|vv) tensor is NEVER
materialized: the tau.(vv|vv) ladder term is accumulated from the 3-index
factor B_vv in fixed-size auxiliary chunks via lax.scan (the device analog
of the reference's blocked _add_vvvv, pyscf/cc/ccsd.py:362 + dfccsd.py),
capping per-step memory at chunk x nocc^2 x nvir^2. The reference's
HDF5-blocked out-of-core paths are replaced by device memory; DIIS runs
on stacked amplitude vectors.
"""
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from ..lib.diis import DIIS
from ..lib import logger

VVVV_AUX_CHUNK = 32     # aux slots per ladder-scan step
OVVV_MAX_ELEMS = 2.0e8  # DF runs ovvv-free above this nocc*nvir^3


def _make_eris(mycc):
    """MO-basis chemists'-notation blocks (ov|ov) etc. from the SCF.

    DF mean-fields keep the 3-index B_vv factor instead of (vv|vv)."""
    mf = mycc._scf
    mol = mycc.mol
    occ = np.asarray(mycc.mo_occ) > 0
    frozen = mycc.frozen
    co = jnp.asarray(mycc.mo_coeff[:, occ][:, frozen:])
    cv = jnp.asarray(mycc.mo_coeff[:, ~occ])
    mo = jnp.concatenate([co, cv], axis=1)
    nocc = co.shape[1]
    e_mo = jnp.asarray(mf.mo_energy)
    eo = e_mo[occ][frozen:]
    ev = e_mo[~occ]
    fock_mo = jnp.diag(jnp.concatenate([eo, ev]))
    common = dict(fock=fock_mo, mo_energy=jnp.concatenate([eo, ev]),
                  nocc=nocc)
    if getattr(mf, 'with_df', None) is not None:
        B = mf.with_df.cderi
        Bo = jnp.einsum('pij,io->poj', B, co)          # (naux, no, nao)
        Boo = jnp.einsum('poj,jm->pom', Bo, co)
        Bov = jnp.einsum('poj,ja->poa', Bo, cv)
        Bvv = jnp.einsum('pij,ia,jb->pab', B, cv, cv)
        naux = B.shape[0]
        pad = -naux % VVVV_AUX_CHUNK
        Bvv_c = jnp.pad(Bvv, ((0, pad), (0, 0), (0, 0))).reshape(
            (naux + pad) // VVVV_AUX_CHUNK, VVVV_AUX_CHUNK,
            cv.shape[1], cv.shape[1])
        nvir = cv.shape[1]
        # above OVVV_MAX_ELEMS the o*v^3 tensor dominates memory: run the
        # ovvv-free update (update_amps_dfb) that contracts every ovvv
        # term from Bov/Bvv instead (reference analog: blocked ovvv loops
        # in pyscf/cc/ccsd.py:147-180 + dfccsd.py)
        ovvv_free = nocc * nvir ** 3 > OVVV_MAX_ELEMS
        Bov_pad = jnp.pad(Bov, ((0, pad), (0, 0), (0, 0)))
        return SimpleNamespace(
            oooo=jnp.einsum('xij,xkl->ijkl', Boo, Boo),
            ooov=jnp.einsum('xij,xka->ijka', Boo, Bov),
            oovv=jnp.einsum('xij,xab->ijab', Boo, Bvv),
            ovov=jnp.einsum('xia,xjb->iajb', Bov, Bov),
            ovvo=jnp.einsum('xia,xjb->iabj', Bov, Bov),
            ovvv=(None if ovvv_free
                  else jnp.einsum('xia,xbc->iabc', Bov, Bvv)),
            Bov=Bov_pad, vvvv=None, Bvv=Bvv_c, **common)
    eri_ao = mf._eri if mf._eri is not None else mol.intor('int2e')
    from .. import ao2mo
    eri = ao2mo.full(eri_ao, mo)
    o = slice(0, nocc)
    v = slice(nocc, None)
    return SimpleNamespace(
        oooo=eri[o, o, o, o], ooov=eri[o, o, o, v], oovv=eri[o, o, v, v],
        ovov=eri[o, v, o, v], ovvo=eri[o, v, v, o], ovvv=eri[o, v, v, v],
        vvvv=eri[v, v, v, v], Bvv=None, Bov=None, **common)


@jax.jit
def energy(t1, t2, ovov):
    """RCCSD correlation energy (canonical orbitals: fov = 0)."""
    tau = t2 + jnp.einsum('ia,jb->ijab', t1, t1)
    e = 2.0 * jnp.einsum('iajb,ijab->', ovov, tau)
    e -= jnp.einsum('ibja,ijab->', ovov, tau)
    return e


def _vvvv_tau_df(Bvv_c, tau):
    """sum_cd (ac|bd) tau_ijcd from chunked B_vv, no (vv|vv) in memory.

    Bvv_c: (nchunk, chunk, v, v) zero-padded aux chunks. One lax.scan
    step holds a (chunk, o, o, v, v) intermediate; padding chunks are
    zero so they add nothing. Analog of reference _add_vvvv
    (pyscf/cc/ccsd.py:362) with aux blocking instead of virtual tiles."""

    def body(acc, Bx):
        tmp = jnp.einsum('xac,ijcd->xijad', Bx, tau)
        return acc + jnp.einsum('xbd,xijad->ijab', Bx, tmp), None

    init = jnp.zeros_like(tau)
    out, _ = jax.lax.scan(body, init, Bvv_c)
    return out


def _vvvv_tau_df_dressed(Bvv_c, Gc, tau):
    """Ladder + the two tau.ovvv.t1 ring terms in ONE aux-chunk scan.

    Reuses the (chunk, o, o, v, v) ladder intermediate tmp[x,i,j,a,d] =
    sum_c Bvv[x,a,c] tau[ijcd'] for three contractions:
      + sum_x Bvv[x,b,d] tmp          (bare Wvvvv.tau ladder)
      - sum_x G[x,b,d]  tmp           (-(kd|ac) tau_ijcd t1_kb)
      - sum_x G[x,a,c]  tmp[x,j,i,b,c]  (-(kc|bd) tau_ijcd t1_ka)
    with G[x,b,d] = sum_k t1[k,b] Bov[x,k,d]. No o*v^3 tensor appears.
    """

    def body(acc, xs):
        Bx, Gx = xs
        tmp = jnp.einsum('xac,ijcd->xijad', Bx, tau)
        acc = acc + jnp.einsum('xbd,xijad->ijab', Bx - Gx, tmp)
        acc = acc - jnp.einsum('xac,xjibc->ijab', Gx, tmp)
        return acc, None

    init = jnp.zeros_like(tau)
    out, _ = jax.lax.scan(body, init, (Bvv_c, Gc))
    return out


@jax.jit
def update_amps_dfb(t1, t2, eris_tuple):
    """One CCSD iteration with every ovvv contraction factorized through
    the DF 3-index tensors: no nocc*nvir^3 tensor is ever materialized.

    Identical amplitude equations to update_amps (Hirata Eqs. 35-45);
    ovvv[k,d,a,c] == sum_x Bov[x,k,d] Bvv[x,a,c] is used to reassociate
    each term so the largest intermediate is the aux-chunked ladder slab.
    Reference analog: the blocked ovvv loops of pyscf/cc/ccsd.py:147-180.
    """
    (oooo, ooov, oovv, ovov, ovvo, Bov, Bvv_c, mo_energy) = eris_tuple
    nocc = t1.shape[0]
    nvir = t1.shape[1]
    eo = mo_energy[:nocc]
    ev = mo_energy[nocc:]
    eia = eo[:, None] - ev[None, :]
    Bvv = Bvv_c.reshape(-1, nvir, nvir)      # padded rows are zero

    # --- kappa intermediates (identical to update_amps)
    Foo = (2.0 * jnp.einsum('kcld,ilcd->ki', ovov, t2)
           - jnp.einsum('kdlc,ilcd->ki', ovov, t2)
           + 2.0 * jnp.einsum('kcld,ic,ld->ki', ovov, t1, t1)
           - jnp.einsum('kdlc,ic,ld->ki', ovov, t1, t1))
    Fvv = (-2.0 * jnp.einsum('kcld,klad->ac', ovov, t2)
           + jnp.einsum('kdlc,klad->ac', ovov, t2)
           - 2.0 * jnp.einsum('kcld,ka,ld->ac', ovov, t1, t1)
           + jnp.einsum('kdlc,ka,ld->ac', ovov, t1, t1))
    Fov = (2.0 * jnp.einsum('kcld,ld->kc', ovov, t1)
           - jnp.einsum('kdlc,ld->kc', ovov, t1))

    ovoo = ooov.transpose(2, 3, 0, 1)
    Loo = Foo + (2.0 * jnp.einsum('lcki,lc->ki', ovoo, t1)
                 - jnp.einsum('kcli,lc->ki', ovoo, t1))
    # Lvv ovvv part: 2*(kd|ac) t1_kd - (kc|ad) t1_kd via B factors
    s_aux = jnp.einsum('xkd,kd->x', Bov, t1)
    lvv1 = jnp.einsum('x,xac->ac', s_aux, Bvv)
    w_ak = jnp.einsum('xad,kd->xak', Bvv, t1)
    lvv2 = jnp.einsum('xak,xkc->ac', w_ak, Bov)
    lvv_t1 = 2.0 * lvv1 - lvv2
    Lvv = Fvv + lvv_t1

    # --- chi intermediates
    Woooo = (jnp.einsum('lcki,jc->klij', ovoo, t1)
             + jnp.einsum('kclj,ic->klij', ovoo, t1)
             + jnp.einsum('kcld,ijcd->klij', ovov, t2)
             + jnp.einsum('kcld,ic,jd->klij', ovov, t1, t1)
             + oooo.transpose(0, 2, 1, 3))
    # (kc|ad) t1_id -> akic
    Bvt = jnp.einsum('xad,id->xai', Bvv, t1)
    wvoov1 = jnp.einsum('xai,xkc->akic', Bvt, Bov)
    Wvoov = (wvoov1
             - jnp.einsum('kcli,la->akic', ovoo, t1)
             + ovvo.transpose(2, 0, 3, 1)
             - 0.5 * jnp.einsum('ldkc,ilda->akic', ovov, t2)
             - 0.5 * jnp.einsum('lckd,ilad->akic', ovov, t2)
             - jnp.einsum('ldkc,id,la->akic', ovov, t1, t1)
             + jnp.einsum('ldkc,ilad->akic', ovov, t2))
    # (kd|ac) t1_id -> akci
    Bot = jnp.einsum('xkd,id->xki', Bov, t1)
    wvovo1 = jnp.einsum('xki,xac->akci', Bot, Bvv)
    Wvovo = (wvovo1
             - jnp.einsum('lcki,la->akci', ovoo, t1)
             + oovv.transpose(2, 0, 3, 1)
             - 0.5 * jnp.einsum('lckd,ilda->akci', ovov, t2)
             - jnp.einsum('lckd,id,la->akci', ovov, t1, t1))

    # --- T1: ovvv.t2 terms via B factors
    u1 = jnp.einsum('xkd,ikcd->xic', Bov, t2)
    t1_o1 = jnp.einsum('xic,xac->ia', u1, Bvv)     # (kd|ac) t2_ikcd
    u2 = jnp.einsum('xkc,ikcd->xid', Bov, t2)
    t1_o2 = jnp.einsum('xid,xad->ia', u2, Bvv)     # (kc|ad) t2_ikcd
    t1new = (jnp.einsum('ac,ic->ia', Fvv, t1)
             - jnp.einsum('ki,ka->ia', Foo, t1)
             + 2.0 * jnp.einsum('kc,kica->ia', Fov, t2)
             - jnp.einsum('kc,ikca->ia', Fov, t2)
             + jnp.einsum('kc,ic,ka->ia', Fov, t1, t1)
             + 2.0 * jnp.einsum('kcai,kc->ia', ovvo, t1)
             - jnp.einsum('kiac,kc->ia', oovv, t1)
             + 2.0 * t1_o1 - t1_o2
             + jnp.einsum('ac,ic->ia', lvv_t1, t1)
             - 2.0 * jnp.einsum('kilc,klac->ia', ooov, t2)
             + jnp.einsum('likc,klac->ia', ooov, t2)
             - 2.0 * jnp.einsum('kilc,lc,ka->ia', ooov, t1, t1)
             + jnp.einsum('likc,lc,ka->ia', ooov, t1, t1))

    # --- T2
    tau = t2 + jnp.einsum('ia,jb->ijab', t1, t1)
    t2new = ovov.transpose(0, 2, 1, 3)
    t2new = t2new + jnp.einsum('klij,klab->ijab', Woooo, tau)
    # ladder + the two tau.ovvv.t1 terms in one dressed aux scan
    G = jnp.einsum('xkd,kb->xbd', Bov, t1)
    Gc = G.reshape(Bvv_c.shape)
    t2new = t2new + _vvvv_tau_df_dressed(Bvv_c, Gc, tau)
    tmp = jnp.einsum('ac,ijcb->ijab', Lvv, t2)
    t2new = t2new + tmp + tmp.transpose(1, 0, 3, 2)
    tmp = jnp.einsum('ki,kjab->ijab', Loo, t2)
    t2new = t2new - tmp - tmp.transpose(1, 0, 3, 2)
    tmp = (2.0 * jnp.einsum('akic,kjcb->ijab', Wvoov, t2)
           - jnp.einsum('akci,kjcb->ijab', Wvovo, t2))
    t2new = t2new + tmp + tmp.transpose(1, 0, 3, 2)
    tmp = jnp.einsum('akic,kjbc->ijab', Wvoov, t2)
    t2new = t2new - tmp - tmp.transpose(1, 0, 3, 2)
    tmp = jnp.einsum('bkci,kjac->ijab', Wvovo, t2)
    t2new = t2new - tmp - tmp.transpose(1, 0, 3, 2)
    # (ia|cb) t1_jc  (tmp2 ovvv part) via B factors
    w_jb = jnp.einsum('xcb,jc->xjb', Bvv, t1)
    tmp = jnp.einsum('xia,xjb->ijab', Bov, w_jb)
    tmp = tmp - jnp.einsum('kibc,ka,jc->abij', oovv, t1,
                           t1).transpose(2, 3, 0, 1)
    t2new = t2new + tmp + tmp.transpose(1, 0, 3, 2)
    tmp2 = (ooov.transpose(3, 1, 2, 0)
            + jnp.einsum('kcai,jc->akij', ovvo, t1))
    tmp = jnp.einsum('akij,kb->ijab', tmp2, t1)
    t2new = t2new - tmp - tmp.transpose(1, 0, 3, 2)

    eijab = eia[:, None, :, None] + eia[None, :, None, :]
    t1new = t1new / eia
    t2new = t2new / eijab
    return t1new, t2new


@jax.jit
def update_amps(t1, t2, eris_tuple):
    """One CCSD iteration: Hirata Eqs. (35)-(45), closed shell.

    eris_tuple carries either a dense vvvv (in-core path) or the chunked
    DF factor Bvv (ladder term via _vvvv_tau_df); exactly one is not None.
    """
    (oooo, ooov, oovv, ovov, ovvo, ovvv, vvvv, Bvv, mo_energy) = \
        eris_tuple
    nocc = t1.shape[0]
    eo = mo_energy[:nocc]
    ev = mo_energy[nocc:]
    eia = eo[:, None] - ev[None, :]

    # --- kappa intermediates (Eqs. 37-39), canonical fock: diag removed later
    Foo = (2.0 * jnp.einsum('kcld,ilcd->ki', ovov, t2)
           - jnp.einsum('kdlc,ilcd->ki', ovov, t2)
           + 2.0 * jnp.einsum('kcld,ic,ld->ki', ovov, t1, t1)
           - jnp.einsum('kdlc,ic,ld->ki', ovov, t1, t1))
    Fvv = (-2.0 * jnp.einsum('kcld,klad->ac', ovov, t2)
           + jnp.einsum('kdlc,klad->ac', ovov, t2)
           - 2.0 * jnp.einsum('kcld,ka,ld->ac', ovov, t1, t1)
           + jnp.einsum('kdlc,ka,ld->ac', ovov, t1, t1))
    Fov = (2.0 * jnp.einsum('kcld,ld->kc', ovov, t1)
           - jnp.einsum('kdlc,ld->kc', ovov, t1))

    # --- lambda intermediates (Eqs. 40-41); ovoo = (ov|oo) = ooov transposed
    ovoo = ooov.transpose(2, 3, 0, 1)          # (lc|ki) from (ki|lc)
    Loo = Foo + (2.0 * jnp.einsum('lcki,lc->ki', ovoo, t1)
                 - jnp.einsum('kcli,lc->ki', ovoo, t1))
    Lvv = Fvv + (2.0 * jnp.einsum('kdac,kd->ac', ovvv, t1)
                 - jnp.einsum('kcad,kd->ac', ovvv, t1))

    # --- chi intermediates (Eqs. 42-45)
    Woooo = (jnp.einsum('lcki,jc->klij', ovoo, t1)
             + jnp.einsum('kclj,ic->klij', ovoo, t1)
             + jnp.einsum('kcld,ijcd->klij', ovov, t2)
             + jnp.einsum('kcld,ic,jd->klij', ovov, t1, t1)
             + oooo.transpose(0, 2, 1, 3))
    Wvoov = (jnp.einsum('kcad,id->akic', ovvv, t1)
             - jnp.einsum('kcli,la->akic', ovoo, t1)
             + ovvo.transpose(2, 0, 3, 1)
             - 0.5 * jnp.einsum('ldkc,ilda->akic', ovov, t2)
             - 0.5 * jnp.einsum('lckd,ilad->akic', ovov, t2)
             - jnp.einsum('ldkc,id,la->akic', ovov, t1, t1)
             + jnp.einsum('ldkc,ilad->akic', ovov, t2))
    Wvovo = (jnp.einsum('kdac,id->akci', ovvv, t1)
             - jnp.einsum('lcki,la->akci', ovoo, t1)
             + oovv.transpose(2, 0, 3, 1)
             - 0.5 * jnp.einsum('lckd,ilda->akci', ovov, t2)
             - jnp.einsum('lckd,id,la->akci', ovov, t1, t1))

    # --- T1 (Eq. 35), canonical orbitals: fov = 0
    t1new = (jnp.einsum('ac,ic->ia', Fvv, t1)
             - jnp.einsum('ki,ka->ia', Foo, t1)
             + 2.0 * jnp.einsum('kc,kica->ia', Fov, t2)
             - jnp.einsum('kc,ikca->ia', Fov, t2)
             + jnp.einsum('kc,ic,ka->ia', Fov, t1, t1)
             + 2.0 * jnp.einsum('kcai,kc->ia', ovvo, t1)
             - jnp.einsum('kiac,kc->ia', oovv, t1)
             + 2.0 * jnp.einsum('kdac,ikcd->ia', ovvv, t2)
             - jnp.einsum('kcad,ikcd->ia', ovvv, t2)
             + 2.0 * jnp.einsum('kdac,kd,ic->ia', ovvv, t1, t1)
             - jnp.einsum('kcad,kd,ic->ia', ovvv, t1, t1)
             - 2.0 * jnp.einsum('kilc,klac->ia', ooov, t2)
             + jnp.einsum('likc,klac->ia', ooov, t2)
             - 2.0 * jnp.einsum('kilc,lc,ka->ia', ooov, t1, t1)
             + jnp.einsum('likc,lc,ka->ia', ooov, t1, t1))

    # --- T2 (Eq. 36)
    tau = t2 + jnp.einsum('ia,jb->ijab', t1, t1)
    t2new = ovov.transpose(0, 2, 1, 3)
    t2new = t2new + jnp.einsum('klij,klab->ijab', Woooo, tau)
    # ladder term Wvvvv.tau; the t1 corrections to Wvvvv are contracted
    # directly against tau so only the bare (ac|bd).tau needs vvvv/B
    tmp = jnp.einsum('kdac,ijcd->kaij', ovvv, tau)
    t2new = t2new - jnp.einsum('kaij,kb->ijab', tmp, t1)
    tmp = jnp.einsum('kcbd,ijcd->kbij', ovvv, tau)
    t2new = t2new - jnp.einsum('kbij,ka->ijab', tmp, t1)
    if Bvv is not None:
        t2new = t2new + _vvvv_tau_df(Bvv, tau)
    else:
        t2new = t2new + jnp.einsum('acbd,ijcd->ijab', vvvv, tau)
    tmp = jnp.einsum('ac,ijcb->ijab', Lvv, t2)
    t2new = t2new + tmp + tmp.transpose(1, 0, 3, 2)
    tmp = jnp.einsum('ki,kjab->ijab', Loo, t2)
    t2new = t2new - tmp - tmp.transpose(1, 0, 3, 2)
    tmp = (2.0 * jnp.einsum('akic,kjcb->ijab', Wvoov, t2)
           - jnp.einsum('akci,kjcb->ijab', Wvovo, t2))
    t2new = t2new + tmp + tmp.transpose(1, 0, 3, 2)
    tmp = jnp.einsum('akic,kjbc->ijab', Wvoov, t2)
    t2new = t2new - tmp - tmp.transpose(1, 0, 3, 2)
    tmp = jnp.einsum('bkci,kjac->ijab', Wvovo, t2)
    t2new = t2new - tmp - tmp.transpose(1, 0, 3, 2)
    tmp2 = (ovvv.transpose(1, 3, 0, 2)
            - jnp.einsum('kibc,ka->abic', oovv, t1))
    tmp = jnp.einsum('abic,jc->ijab', tmp2, t1)
    t2new = t2new + tmp + tmp.transpose(1, 0, 3, 2)
    tmp2 = (ooov.transpose(3, 1, 2, 0)
            + jnp.einsum('kcai,jc->akij', ovvo, t1))
    tmp = jnp.einsum('akij,kb->ijab', tmp2, t1)
    t2new = t2new - tmp - tmp.transpose(1, 0, 3, 2)

    eijab = eia[:, None, :, None] + eia[None, :, None, :]
    t1new = t1new / eia
    t2new = t2new / eijab
    return t1new, t2new


class CCSD:
    conv_tol = 1e-7
    conv_tol_normt = 1e-6
    max_cycle = 50
    diis_space = 6
    diis_start_cycle = 0

    def __init__(self, mf, frozen=0, mo_coeff=None, mo_occ=None):
        self._scf = mf
        self.mol = mf.mol
        self.verbose = mf.mol.verbose
        self.frozen = frozen or 0
        self.mo_coeff = mo_coeff if mo_coeff is not None else mf.mo_coeff
        self.mo_occ = mo_occ if mo_occ is not None else mf.mo_occ
        self.converged = False
        self.e_corr = None
        self.t1 = None
        self.t2 = None
        self._eris = None

    @property
    def nocc(self):
        return int((np.asarray(self.mo_occ) > 0).sum()) - self.frozen

    @property
    def nmo(self):
        return self.mo_coeff.shape[1] - self.frozen

    @property
    def e_tot(self):
        return float(self.e_corr) + float(self._scf.e_tot)

    def ao2mo(self):
        return _make_eris(self)

    def init_amps(self, eris):
        nocc = eris.nocc
        mo_e = eris.mo_energy
        eia = mo_e[:nocc, None] - mo_e[None, nocc:]
        eijab = eia[:, None, :, None] + eia[None, :, None, :]
        t2 = eris.ovov.transpose(0, 2, 1, 3) / eijab
        t1 = jnp.zeros((nocc, mo_e.shape[0] - nocc))
        emp2 = float(energy(t1, t2, eris.ovov))
        return emp2, t1, t2

    def kernel(self, t1=None, t2=None):
        log = logger.new_logger(self)
        t_start = time.time()
        eris = self._eris = self.ao2mo()
        log.timer('CCSD integral transformation')
        t1_in, t2_in = t1, t2
        emp2, t1, t2 = self.init_amps(eris)
        if t1_in is not None and t2_in is not None:
            # restart amplitudes (chkfile resume or user-provided guess)
            t1 = jnp.asarray(t1_in)
            t2 = jnp.asarray(t2_in)
        log.info('MP2 initial guess E_corr = %.12f', emp2)
        if eris.ovvv is None:
            # ovvv-free DF path: every ovvv term via the 3-index factors
            step = update_amps_dfb
            eris_tuple = (eris.oooo, eris.ooov, eris.oovv, eris.ovov,
                          eris.ovvo, eris.Bov, eris.Bvv, eris.mo_energy)
        else:
            step = update_amps
            eris_tuple = (eris.oooo, eris.ooov, eris.oovv, eris.ovov,
                          eris.ovvo, eris.ovvv, eris.vvvv, eris.Bvv,
                          eris.mo_energy)
        diis = DIIS(self.diis_space)
        e_last = emp2
        conv = False
        for it in range(self.max_cycle):
            t1new, t2new = step(t1, t2, eris_tuple)
            normt = float(jnp.linalg.norm(t1new - t1)
                          + jnp.linalg.norm(t2new - t2))
            t1, t2 = diis.update(
                (t1new, t2new),
                (t1new - t1, t2new - t2))
            e_corr = float(energy(t1, t2, eris.ovov))
            de = e_corr - e_last
            e_last = e_corr
            log.info('cycle = %d  E_corr(CCSD) = %.12f  dE = %.3g  '
                     'norm(t1,t2) = %.3g', it + 1, e_corr, de, normt)
            log.timer('CCSD iter %d' % (it + 1))
            if getattr(self, 'chkfile', None):
                self.dump_chk(t1, t2, e_corr)
            if abs(de) < self.conv_tol and normt < self.conv_tol_normt:
                conv = True
                break
        self.converged = conv
        self.e_corr = e_corr
        self.t1, self.t2 = t1, t2
        state = 'converged' if conv else 'NOT converged'
        log.note('CCSD %s. E_corr = %.12f (%.1fs)', state, self.e_corr,
                 time.time() - t_start)
        return self.e_corr, t1, t2

    run = kernel

    def dump_chk(self, t1=None, t2=None, e_corr=None):
        """Per-cycle amplitude checkpoint (reference cc/ccsd.py
        restore_from_diis_ analog, HDF5 via lib/chkfile)."""
        from ..lib import chkfile as chk
        chk.dump(self.chkfile, 'ccsd/t1',
                 np.asarray(t1 if t1 is not None else self.t1))
        chk.dump(self.chkfile, 'ccsd/t2',
                 np.asarray(t2 if t2 is not None else self.t2))
        if e_corr is not None:
            chk.dump(self.chkfile, 'ccsd/e_corr', float(e_corr))

    def restore_from_chk_(self, chkfile=None):
        """Resume the iteration from checkpointed amplitudes."""
        from ..lib import chkfile as chk
        fn = chkfile or self.chkfile
        t1 = chk.load(fn, 'ccsd/t1')
        t2 = chk.load(fn, 'ccsd/t2')
        return self.kernel(t1=jnp.asarray(t1), t2=jnp.asarray(t2))

    def ccsd_t(self, t1=None, t2=None, mesh=None):
        from .ccsd_t import kernel as t_kernel
        return t_kernel(self, self._eris, t1 or self.t1, t2 or self.t2,
                        mesh=mesh)

    def ccsd(self, t1=None, t2=None):
        return self.kernel(t1, t2)

    # ---- spatial-orbital EOM-CCSD (cc/eom_rccsd.py) -------------------
    def eomee_ccsd_singlet(self, nroots=3):
        from .eom_rccsd import EOMEESinglet
        eom = EOMEESinglet(self)
        return eom.kernel(nroots), eom.v

    def ipccsd(self, nroots=3):
        from .eom_rccsd import EOMIP
        eom = EOMIP(self)
        return eom.kernel(nroots), eom.v

    def eaccsd(self, nroots=3):
        from .eom_rccsd import EOMEA
        eom = EOMEA(self)
        return eom.kernel(nroots), eom.v


RCCSD = CCSD


def _ccsd_gradients(self):
    from ..grad.ccsd import Gradients as _G
    return _G(self)


CCSD.Gradients = _ccsd_gradients
CCSD.nuc_grad_method = _ccsd_gradients
