"""CASSCF orbital optimization (analog of reference pyscf/mcscf/mc1step.py:
CASSCF:596, kernel:333, rotate_orb_cc:204).

Two-step macro-iteration: FCI solve in the active space, then orbital
relaxation on the frozen-CI energy surface E(kappa) by the device-
resident augmented-Hessian Newton solver (soscf._ah_davidson): E(kappa)
is a pure JAX function (orbitals rotated by expm(kappa), MO integrals by
dense einsum on device), the gradient is jax.grad and the exact Hessian
action is jax.jvp of it -- replacing the reference's hand-coded CIAH
gen_g_hop (mc1step.py:42) with autodiff of the same surface.
"""
import numpy as np
import jax
import jax.numpy as jnp
import scipy.linalg

from ..fci import direct_spin1
from .casci import CASCI


class CASSCF(CASCI):
    max_cycle_macro = 50
    max_cycle_micro = 20
    conv_tol = 1e-8
    conv_tol_grad = 1e-3

    def _rotation_mask(self, nmo):
        ncore, nocc = self.ncore, self.ncore + self.ncas
        mask = np.zeros((nmo, nmo), dtype=bool)
        mask[:ncore, ncore:] = True            # core -> active+virtual
        mask[ncore:nocc, nocc:] = True         # active -> virtual
        return mask

    def _energy_and_grad_fixed_ci(self, mo, casdm1, casdm2, eri_ao):
        """E and generalized-Fock orbital gradient at fixed CI RDMs."""
        ncore, ncas = self.ncore, self.ncas
        nocc = ncore + ncas
        nmo = mo.shape[1]
        from .. import ao2mo
        hcore = np.asarray(mo.T @ np.asarray(self._scf.get_hcore()) @ mo)
        eri_gen = np.asarray(ao2mo.full(eri_ao, jnp.asarray(mo)))
        act = slice(ncore, nocc)
        dm_core = np.zeros((nmo, nmo))
        np.fill_diagonal(dm_core[:ncore, :ncore], 2.0)
        jc = np.einsum('pqrs,rs->pq', eri_gen, dm_core)
        kc = np.einsum('prqs,rs->pq', eri_gen, dm_core)
        f_inact = hcore + jc - 0.5 * kc
        ja = np.einsum('pqrs,rs->pq', eri_gen[:, :, act, act], casdm1)
        ka = np.einsum('prqs,rs->pq', eri_gen[:, act, :, act], casdm1)
        f_act = ja - 0.5 * ka
        # energy
        e_core = (np.einsum('pq,pq->', hcore, dm_core)
                  + 0.5 * np.einsum('pq,pq->', jc - 0.5 * kc, dm_core))
        e_act1 = np.einsum('pq,pq->', f_inact[act, act], casdm1)
        eri_aaaa = eri_gen[act, act, act, act]
        e_act2 = 0.5 * np.einsum('pqrs,pqrs->', eri_aaaa, casdm2)
        e_tot = e_core + e_act1 + e_act2 + self.mol.energy_nuc()
        # generalized Fock
        F = np.zeros((nmo, nmo))
        F[:, :ncore] = 2.0 * (f_inact + f_act)[:, :ncore]
        F[:, act] = f_inact[:, act] @ casdm1
        F[:, act] += np.einsum('puvw,tuvw->pt', eri_gen[:, act, act, act],
                               casdm2)
        g = 2.0 * (F - F.T)
        return e_tot, g

    def _e_fixed_ci_fn(self, nmo, iu):
        """Jitted E(kappa; mo0, rdms) on the frozen-CI surface.

        All tensor work (MO transform, generalized Fock contraction) is
        dense einsum on device; kappa enters through expm so jax.grad /
        jax.jvp give the exact CIAH gradient and Hessian action."""
        ncore, ncas = self.ncore, self.ncas
        nocc = ncore + ncas
        act = slice(ncore, nocc)
        e_nuc = float(self.mol.energy_nuc())
        iu_r = jnp.asarray(iu[0])
        iu_c = jnp.asarray(iu[1])

        @jax.jit
        def e_fixed(kx, mo0, hcore_ao, eri_ao, casdm1, casdm2):
            kap = jnp.zeros((nmo, nmo)).at[iu_r, iu_c].set(kx)
            kap = kap - kap.T
            mo = mo0 @ jax.scipy.linalg.expm(kap)
            hcore = mo.T @ hcore_ao @ mo
            co = mo[:, :ncore]
            ca = mo[:, act]
            # core J/K via half transforms (never the full nmo^4 tensor)
            dmc_ao = 2.0 * co @ co.T
            jc_ao = jnp.einsum('pqrs,sr->pq', eri_ao, dmc_ao)
            kc_ao = jnp.einsum('prqs,sr->pq', eri_ao, dmc_ao)
            vhf_c_ao = jc_ao - 0.5 * kc_ao
            e_core = (jnp.einsum('pq,qp->', hcore_ao + 0.5 * vhf_c_ao,
                                 dmc_ao))
            f_inact_aa = ca.T @ (hcore_ao + vhf_c_ao) @ ca
            # active-space ERI (uv|wx)
            eri_a = jnp.einsum('pqrs,pu,qv,rw,sx->uvwx', eri_ao,
                               ca, ca, ca, ca)
            e_act1 = jnp.einsum('pq,pq->', f_inact_aa, casdm1)
            e_act2 = 0.5 * jnp.einsum('pqrs,pqrs->', eri_a, casdm2)
            return e_core + e_act1 + e_act2 + e_nuc

        return e_fixed

    def kernel(self, mo_coeff=None, ci0=None):
        mo = np.asarray(mo_coeff if mo_coeff is not None else self.mo_coeff)
        eri_ao = jnp.asarray(self._eri_ao())
        hcore_ao = jnp.asarray(self._scf.get_hcore())
        nmo = mo.shape[1]
        mask = self._rotation_mask(nmo)
        iu = np.where(mask)
        nrot = len(iu[0])
        e_fixed = self._e_fixed_ci_fn(nmo, iu)
        grad_fn = jax.jit(jax.grad(e_fixed))
        zero = jnp.zeros(nrot)

        @jax.jit
        def hvp_fn(v, mo0, d1, d2):
            return jax.jvp(
                lambda k: grad_fn(k, mo0, hcore_ao, eri_ao, d1, d2),
                (zero,), (v,))[1]

        from ..soscf import _ah_davidson
        from ..lib import logger
        log = logger.new_logger(self)
        e_last = None
        conv = False
        ci0_ = ci0
        for it in range(self.max_cycle_macro):
            e_tot, e_cas, ci = CASCI.kernel(self, jnp.asarray(mo), ci0_)
            ci0_ = self.ci
            casdm1, casdm2 = self.fcisolver.make_rdm12(self.ci, self.ncas,
                                                       self.nelecas)
            d1 = jnp.asarray(casdm1)
            d2 = jnp.asarray(casdm2)
            mo_j = jnp.asarray(mo)
            # AH Newton micro-iterations on the frozen-CI surface
            trust = 0.3
            kx_norm = 0.0
            gnorm = 0.0
            for micro in range(self.max_cycle_micro):
                g = np.asarray(grad_fn(zero, mo_j, hcore_ao, eri_ao,
                                       d1, d2))
                gnorm = np.linalg.norm(g)
                if gnorm < 1e-7:
                    break
                step, _ = _ah_davidson(
                    g, lambda v: hvp_fn(v, mo_j, d1, d2), trust)
                e_try = float(e_fixed(jnp.asarray(step), mo_j, hcore_ao,
                                      eri_ao, d1, d2))
                e_cur = float(e_fixed(zero, mo_j, hcore_ao, eri_ao,
                                      d1, d2))
                if e_try > e_cur + 1e-12 and trust > 0.02:
                    trust *= 0.5
                    continue
                trust = min(0.3, trust * 1.5)
                kap = np.zeros((nmo, nmo))
                kap[iu] = step
                kap = kap - kap.T
                mo_j = jnp.asarray(np.asarray(mo_j)
                                   @ scipy.linalg.expm(kap))
                kx_norm = np.linalg.norm(step)
                if kx_norm < 1e-8:
                    break
            mo = np.asarray(mo_j)
            log.info('macro %d  E = %.12f  |g_orb| = %.3e  '
                     '|kappa| = %.3e', it + 1, e_tot, gnorm, kx_norm)
            if getattr(self, 'chkfile', None):
                self.dump_chk(mo, e_tot)
            if e_last is not None and abs(e_tot - e_last) < self.conv_tol \
                    and kx_norm < self.conv_tol_grad:
                conv = True
                break
            e_last = e_tot
        self.converged = conv
        self.mo_coeff = jnp.asarray(mo)
        self.e_tot = e_tot
        return e_tot, e_cas, self.ci

    run = kernel

    def Gradients(self):
        from ..grad.casscf import Gradients
        return Gradients(self)

    nuc_grad_method = Gradients

    def dump_chk(self, mo=None, e_tot=None):
        """Per-macro-iteration checkpoint (reference mcscf/chkfile.py)."""
        from ..lib import chkfile as chk
        chk.dump(self.chkfile, 'mcscf/mo_coeff',
                 np.asarray(mo if mo is not None else self.mo_coeff))
        ci = self.ci
        if isinstance(ci, (list, tuple)):
            for i, c in enumerate(ci):
                chk.dump(self.chkfile, f'mcscf/ci_{i}', np.asarray(c))
            chk.dump(self.chkfile, 'mcscf/nroots', len(ci))
        else:
            chk.dump(self.chkfile, 'mcscf/ci_0', np.asarray(ci))
            chk.dump(self.chkfile, 'mcscf/nroots', 1)
        if e_tot is not None:
            chk.dump(self.chkfile, 'mcscf/e_tot', float(e_tot))

    def restore_from_chk_(self, chkfile=None):
        """Resume the macro-iteration from checkpointed orbitals/CI."""
        from ..lib import chkfile as chk
        fn = chkfile or self.chkfile
        mo = chk.load(fn, 'mcscf/mo_coeff')
        nroots = int(chk.load(fn, 'mcscf/nroots'))
        if nroots == 1:
            ci0 = np.asarray(chk.load(fn, 'mcscf/ci_0'))
        else:
            ci0 = [np.asarray(chk.load(fn, f'mcscf/ci_{i}'))
                   for i in range(nroots)]
        return self.kernel(mo_coeff=np.asarray(mo), ci0=ci0)
