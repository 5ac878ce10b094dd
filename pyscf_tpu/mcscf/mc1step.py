"""CASSCF orbital optimization (analog of reference pyscf/mcscf/mc1step.py:
CASSCF:596, kernel:333).

Two-step macro-iteration: FCI solve in the active space, then orbital
relaxation by L-BFGS on the frozen-CI energy surface E(kappa) with the
exact generalized-Fock gradient (the reference's CIAH micro-iteration is
replaced by quasi-Newton on the same surface; dense XLA tensor algebra).
"""
import numpy as np
import jax.numpy as jnp
import scipy.linalg
import scipy.optimize

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

    def kernel(self, mo_coeff=None, ci0=None):
        mo = np.asarray(mo_coeff if mo_coeff is not None else self.mo_coeff)
        eri_ao = self._scf._eri
        if eri_ao is None:
            eri_ao = self.mol.intor('int2e')
            self._scf._eri = eri_ao
        nmo = mo.shape[1]
        mask = self._rotation_mask(nmo)
        iu = np.where(mask)
        e_last = None
        conv = False
        ci0_ = ci0
        for it in range(self.max_cycle_macro):
            e_tot, e_cas, ci = CASCI.kernel(self, jnp.asarray(mo), ci0_)
            ci0_ = self.ci
            casdm1, casdm2 = self.fcisolver.make_rdm12(self.ci, self.ncas,
                                                       self.nelecas)
            mo_it = mo

            def fun(x):
                kap = np.zeros((nmo, nmo))
                kap[iu] = x
                kap = kap - kap.T
                mo_x = mo_it @ scipy.linalg.expm(kap)
                e, g = self._energy_and_grad_fixed_ci(mo_x, casdm1, casdm2,
                                                      eri_ao)
                # chain rule through expm ~ identity + kap (small steps):
                # use gradient at mo_x projected to the rotation params
                return e, g[iu]

            res = scipy.optimize.minimize(
                fun, np.zeros(len(iu[0])), jac=True, method='L-BFGS-B',
                options={'maxiter': self.max_cycle_micro, 'gtol': 1e-7})
            kap = np.zeros((nmo, nmo))
            kap[iu] = res.x
            kap = kap - kap.T
            mo = mo_it @ scipy.linalg.expm(kap)
            gnorm = np.linalg.norm(res.jac)
            if self.verbose >= 4:
                print(f'macro {it + 1}  E = {e_tot:.12f}  '
                      f'|g_orb| = {gnorm:.3e}  |kappa| = '
                      f'{np.linalg.norm(res.x):.3e}')
            if getattr(self, 'chkfile', None):
                self.dump_chk(mo, e_tot)
            if e_last is not None and abs(e_tot - e_last) < self.conv_tol \
                    and np.linalg.norm(res.x) < self.conv_tol_grad:
                conv = True
                break
            e_last = e_tot
        self.converged = conv
        self.mo_coeff = jnp.asarray(mo)
        self.e_tot = e_tot
        return e_tot, e_cas, self.ci

    run = kernel

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
