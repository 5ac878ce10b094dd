"""CASCI (analog of reference pyscf/mcscf/casci.py: CASCI:1106, kernel:563,
h1e_for_cas:44)."""
import numpy as np
import jax.numpy as jnp

from ..fci import direct_spin1


class CASCI:
    def __init__(self, mf, ncas, nelecas, ncore=None):
        self._scf = mf
        self.mol = mf.mol
        self.mo_coeff = mf.mo_coeff
        self.ncas = ncas
        if isinstance(nelecas, (int, np.integer)):
            nb = (nelecas - mf.mol.spin) // 2
            self.nelecas = (nelecas - nb, nb)
        else:
            self.nelecas = tuple(nelecas)
        if ncore is None:
            ncore = (mf.mol.nelectron - sum(self.nelecas)) // 2
        self.ncore = ncore
        self.fcisolver = direct_spin1
        self.e_tot = None
        self.ci = None
        self.verbose = mf.mol.verbose

    def density_fit(self, auxbasis=None):
        """Use a density-fitted ERI everywhere in the CAS problem (core
        Fock, active-space integrals, orbital optimization) — the analog
        of reference mcscf/df.py density_fit (DFCASCI/DFCASSCF). Reuses
        the mean field's DF factor when compatible."""
        from ..df import DF
        mfdf = getattr(self._scf, 'with_df', None)
        if mfdf is not None and (auxbasis is None
                                 or auxbasis == mfdf.auxbasis):
            self.with_df = mfdf
        else:
            self.with_df = DF(self.mol, auxbasis).build()
        return self

    def _eri_ao(self):
        """Dense AO ERI tensor: exact, or assembled from the DF factor
        when .density_fit() was requested (then every CAS quantity is
        consistently the DF approximation, which is what the analytic
        gradient differentiates)."""
        import jax.numpy as _jnp
        wdf = getattr(self, 'with_df', None)
        if wdf is not None:
            B = wdf.cderi
            return _jnp.einsum('pij,pkl->ijkl', B, B)
        eri = self._scf._eri
        if eri is None:
            eri = self.mol.intor('int2e')
            self._scf._eri = eri
        return eri

    def h1e_for_cas(self, mo_coeff=None):
        mo = mo_coeff if mo_coeff is not None else self.mo_coeff
        ncore, ncas = self.ncore, self.ncas
        mo_core = mo[:, :ncore]
        mo_cas = mo[:, ncore:ncore + ncas]
        hcore = self._scf.get_hcore()
        if ncore > 0:
            dm_core = 2.0 * mo_core @ mo_core.T
            wdf = getattr(self, 'with_df', None)
            if wdf is not None:
                vj, vk = wdf.get_jk(dm_core)
            else:
                vj, vk = self._scf.get_jk(self.mol, dm_core)
            veff = vj - 0.5 * vk
            ecore = (self.mol.energy_nuc()
                     + float(jnp.einsum('ij,ji->', hcore, dm_core))
                     + 0.5 * float(jnp.einsum('ij,ji->', veff, dm_core)))
            h1 = mo_cas.T @ (hcore + veff) @ mo_cas
        else:
            ecore = self.mol.energy_nuc()
            h1 = mo_cas.T @ hcore @ mo_cas
        return np.asarray(h1), ecore

    def get_h2eff(self, mo_coeff=None):
        mo = mo_coeff if mo_coeff is not None else self.mo_coeff
        mo_cas = mo[:, self.ncore:self.ncore + self.ncas]
        from .. import ao2mo
        wdf = getattr(self, 'with_df', None)
        if wdf is not None:
            from ..df.df_jk import _bmo
            Ba = _bmo(wdf.cderi, jnp.asarray(mo_cas), jnp.asarray(mo_cas))
            return np.asarray(jnp.einsum('ptu,pvw->tuvw', Ba, Ba))
        eri_ao = self._scf._eri
        if eri_ao is None:
            eri_ao = self.mol.intor('int2e')
            self._scf._eri = eri_ao
        return np.asarray(ao2mo.full(eri_ao, jnp.asarray(mo_cas)))

    def kernel(self, mo_coeff=None, ci0=None):
        mo = mo_coeff if mo_coeff is not None else self.mo_coeff
        h1, ecore = self.h1e_for_cas(mo)
        eri_cas = self.get_h2eff(mo)
        e_tot, ci = self.fcisolver.kernel(h1, eri_cas, self.ncas,
                                          self.nelecas, ecore=ecore, ci0=ci0)
        self.e_tot = e_tot
        self.ci = ci
        self.e_cas = e_tot - ecore
        if getattr(self.fcisolver, 'e_states', None) is not None:
            self.e_states = np.asarray(self.fcisolver.e_states)
        if self.verbose >= 4:
            print(f'CASCI E = {e_tot:.12f}')
        return e_tot, self.e_cas, ci

    run = kernel

    def make_rdm1(self, ci=None, mo_coeff=None):
        """AO-basis total 1-RDM (core + active)."""
        ci = ci if ci is not None else self.ci
        mo = mo_coeff if mo_coeff is not None else self.mo_coeff
        ncore, ncas = self.ncore, self.ncas
        casdm1 = self.fcisolver.make_rdm1(ci, ncas, self.nelecas)
        mo_core = mo[:, :ncore]
        mo_cas = mo[:, ncore:ncore + ncas]
        dm = 2.0 * mo_core @ mo_core.T
        dm = dm + mo_cas @ jnp.asarray(casdm1) @ mo_cas.T
        return dm

    def cas_natorb(self, ci=None, mo_coeff=None):
        """Natural orbitals of the active space (reference
        mcscf/casci.py cas_natorb:350). Diagonalizes the active-space
        1-RDM, rotates the active MO block to natural orbitals sorted by
        descending occupation, and re-solves the CI problem in that
        basis (the reference transforms the CI vector directly; for the
        dense FCI solver used here a re-solve is exact and cheap).

        Returns (mo_new, ci_new, occ) where occ are the natural
        occupation numbers (sum = nelecas).
        """
        ci = ci if ci is not None else self.ci
        mo = np.asarray(mo_coeff if mo_coeff is not None else self.mo_coeff)
        ncore, ncas = self.ncore, self.ncas
        casdm1 = np.asarray(self.fcisolver.make_rdm1(ci, ncas, self.nelecas))
        occ, u = np.linalg.eigh(0.5 * (casdm1 + casdm1.T))
        occ, u = occ[::-1], u[:, ::-1]          # descending occupation
        # fix gauge: largest component of each NO positive
        for k in range(ncas):
            j = np.argmax(abs(u[:, k]))
            if u[j, k] < 0:
                u[:, k] *= -1
        mo_new = mo.copy()
        mo_new[:, ncore:ncore + ncas] = mo[:, ncore:ncore + ncas] @ u
        _, _, ci_new = CASCI.kernel(self, jnp.asarray(mo_new))
        return jnp.asarray(mo_new), ci_new, occ
