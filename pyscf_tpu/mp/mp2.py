"""Restricted MP2 (analog of reference pyscf/mp/mp2.py: RMP2:696, kernel:33).

Conventional path: (ia|jb) via dense ao2mo; DF path: B[P,ia] factor
contraction. Energy evaluation is a single jitted einsum chain (MXU).
"""
import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _emp2_from_ovov(ovov, eia):
    """ovov: (nocc, nvir, nocc, nvir); eia: (nocc, nvir) = e_i - e_a."""
    denom = (eia[:, :, None, None] + eia[None, None, :, :])
    t2 = ovov / denom
    ed = jnp.einsum('iajb,iajb->', ovov, t2) * 2.0
    ex = -jnp.einsum('iajb,ibja->', ovov, t2)
    return ed + ex, t2


@jax.jit
def _emp2_os_ss(ovov, eia):
    """(E_os, E_ss) opposite-/same-spin components (closed shell):
    E_os = sum (ia|jb) t_iajb; E_ss = sum (ia|jb)(t_iajb - t_ibja)."""
    denom = (eia[:, :, None, None] + eia[None, None, :, :])
    t2 = ovov / denom
    e_os = jnp.einsum('iajb,iajb->', ovov, t2)
    e_ss = e_os - jnp.einsum('iajb,ibja->', ovov, t2)
    return e_os, e_ss


class MP2:
    def __init__(self, mf, frozen=0, mo_coeff=None, mo_occ=None):
        self._scf = mf
        self.mol = mf.mol
        self.frozen = frozen or 0
        self.mo_coeff = mo_coeff if mo_coeff is not None else mf.mo_coeff
        self.mo_occ = mo_occ if mo_occ is not None else mf.mo_occ
        self.mo_energy = mf.mo_energy
        self.e_corr = None
        self.t2 = None
        self.with_df = getattr(mf, 'with_df', None)

    @property
    def nocc(self):
        return int((np.asarray(self.mo_occ) > 0).sum()) - self.frozen

    @property
    def nmo(self):
        return self.mo_coeff.shape[1] - self.frozen

    @property
    def e_tot(self):
        return float(self.e_corr) + float(self._scf.e_tot)

    def get_ovov(self):
        occ = np.asarray(self.mo_occ) > 0
        co = self.mo_coeff[:, occ][:, self.frozen:]
        cv = self.mo_coeff[:, ~occ]
        if self.with_df is not None:
            from ..df.df_jk import _bmo
            Bov = _bmo(self.with_df.cderi, co, cv)
            return jnp.einsum('pia,pjb->iajb', Bov, Bov)
        from .. import ao2mo
        eri = self._scf._eri
        if eri is None:
            eri = self.mol.intor('int2e')
        return ao2mo.general(eri, (co, cv, co, cv))

    def kernel(self, mo_energy=None, mo_coeff=None):
        occ = np.asarray(self.mo_occ) > 0
        e = jnp.asarray(self.mo_energy)
        eo = e[occ][self.frozen:]
        ev = e[~occ]
        eia = eo[:, None] - ev[None, :]
        ovov = self.get_ovov()
        e_corr, t2 = _emp2_from_ovov(ovov, eia)
        self.e_corr = float(e_corr)
        self.t2 = t2
        return self.e_corr, t2

    run = kernel

    def make_rdm1(self, t2=None):
        """MP2 1-RDM (without orbital relaxation), MO basis."""
        t2 = t2 if t2 is not None else self.t2
        # t2[i,a,j,b]
        dvv = (2 * jnp.einsum('iajb,icjb->ac', t2, t2)
               - jnp.einsum('iajb,ibjc->ac', t2, t2))
        doo = -(2 * jnp.einsum('iajb,kajb->ik', t2, t2)
                - jnp.einsum('iajb,kbja->ik', t2, t2))
        nocc, nvir = t2.shape[0], t2.shape[1]
        nmo = nocc + nvir
        dm = jnp.zeros((nmo, nmo))
        dm = dm.at[:nocc, :nocc].set(doo + 2 * jnp.eye(nocc))
        dm = dm.at[nocc:, nocc:].set(dvv)
        return dm

    def energy_scs(self, p_os=1.2, p_ss=1.0 / 3.0):
        """Spin-component-scaled MP2 (Grimme 2003: 1.2/os + 1/3 ss);
        SOS-MP2 via energy_scs(1.3, 0.0) (Jung 2004). Reference analog:
        the os/ss split of mp/mp2.py. (1, 1) recovers plain MP2."""
        occ = np.asarray(self.mo_occ) > 0
        e = jnp.asarray(self.mo_energy)
        eo = e[occ][self.frozen:]
        ev = e[~occ]
        eia = eo[:, None] - ev[None, :]
        e_os, e_ss = _emp2_os_ss(self.get_ovov(), eia)
        return float(p_os * e_os + p_ss * e_ss)

    def make_fno(self, thresh=1e-6, nvir_act=None):
        """Frozen-natural-orbital virtual space (reference mp/mp2.py
        make_fno:217): diagonalize the MP2 virtual-virtual density and
        keep NOs above the occupation threshold (or the nvir_act largest).

        Returns (nvir_kept, no_coeff) where no_coeff is the full
        (nao, nmo) coefficient matrix with the virtual block rotated to
        natural orbitals, largest occupation first.
        """
        if self.t2 is None:
            self.kernel()
        t2 = self.t2
        dvv = np.asarray(2 * jnp.einsum('iajb,icjb->ac', t2, t2)
                         - jnp.einsum('iajb,ibjc->ac', t2, t2)) * 2.0
        w, v = np.linalg.eigh(0.5 * (dvv + dvv.T))
        w, v = w[::-1], v[:, ::-1]               # descending occupation
        if nvir_act is None:
            nvir_act = max(1, int(np.sum(w > thresh)))
        occ = np.asarray(self.mo_occ) > 0
        co = np.asarray(self.mo_coeff)[:, occ]
        cv = np.asarray(self.mo_coeff)[:, ~occ]
        no_coeff = np.hstack([co, cv @ v])
        return nvir_act, no_coeff


RMP2 = MP2


def _mp2_gradients(self):
    from ..grad.mp2 import Gradients as _G
    return _G(self)


MP2.Gradients = _mp2_gradients
MP2.nuc_grad_method = _mp2_gradients
