"""Nonadiabatic derivative couplings between CASCI states.

Reference analog: pyscf/nac/sacasscf.py. This implements the CI
contribution in the frozen-orbital picture:

    d_IJ^A = <c_I| dH_cas/dR_A |c_J> / (E_J - E_I)

with dH_cas/dR from central differences of the active-space (h1, eri)
at fixed MO coefficients, and the matrix element contracted through the
transition RDMs (fci/rdm.py). The orbital-response (Lagrangian) terms of
the full SA-CASSCF coupling are the reference's analytic path and remain
future work; the frozen-orbital term is validated exactly against
finite differences of the CI vectors in tests/test_nac.py.
"""
import numpy as np

from ..fci import direct_spin1, rdm


def _cas_hamiltonian(mc, mol, mo):
    """(h1_cas, eri_cas, ecore) of mol in the fixed-mo active space."""
    import jax.numpy as jnp
    from .. import ao2mo
    ncore, ncas = mc.ncore, mc.ncas
    mo = np.asarray(mo)
    mo_core = mo[:, :ncore]
    mo_cas = mo[:, ncore:ncore + ncas]
    hcore = np.asarray(mol.intor('int1e_kin')) + np.asarray(
        mol.intor('int1e_nuc'))
    eri_ao = mol.intor('int2e')
    if ncore > 0:
        dm_core = 2.0 * mo_core @ mo_core.T
        vj = np.einsum('uvls,sl->uv', np.asarray(eri_ao), dm_core)
        vk = np.einsum('ulsv,sl->uv', np.asarray(eri_ao), dm_core)
        veff = vj - 0.5 * vk
        ecore = (mol.energy_nuc()
                 + np.einsum('uv,vu->', hcore, dm_core)
                 + 0.5 * np.einsum('uv,vu->', veff, dm_core))
        h1 = mo_cas.T @ (hcore + veff) @ mo_cas
    else:
        ecore = mol.energy_nuc()
        h1 = mo_cas.T @ hcore @ mo_cas
    eri_cas = np.asarray(ao2mo.full(eri_ao, jnp.asarray(mo_cas)))
    eri_cas = eri_cas.reshape((ncas,) * 4)
    return np.asarray(h1), eri_cas, float(ecore)


def _trans_element(ci_i, ci_j, h1, eri, ncas, nelecas):
    """<c_I| H(h1, eri) |c_J> (no core constant)."""
    dm1, dm2 = rdm.trans_rdm12(ci_i, ci_j, ncas, nelecas)
    return (np.einsum('pq,pq->', h1, dm1)
            + 0.5 * np.einsum('pqrs,pqrs->', eri, dm2))


class NACCASCI:
    """CI-contribution derivative couplings for a multi-root CASCI."""

    def __init__(self, mc):
        self.mc = mc
        self.mol = mc.mol

    def kernel(self, state_i=0, state_j=1, step=1e-4):
        mc = self.mc
        mol = self.mol
        mo = np.asarray(mc.mo_coeff)
        ci = mc.ci
        assert isinstance(ci, (list, tuple)), 'run CASCI with nroots >= 2'
        e = np.asarray(mc.e_states if hasattr(mc, 'e_states')
                       else mc.e_tot)
        ci_i, ci_j = np.asarray(ci[state_i]), np.asarray(ci[state_j])
        de = float(e[state_j] - e[state_i])
        coords0 = np.asarray(mol.coords).copy()
        natm = mol.natm
        out = np.zeros((natm, 3))
        for A in range(natm):
            for x in range(3):
                hs = []
                for sgn in (1.0, -1.0):
                    c = coords0.copy()
                    c[A, x] += sgn * step
                    m2 = mol.copy()
                    m2.set_geom_(c)
                    h1, eri, _ = _cas_hamiltonian(mc, m2, mo)
                    hs.append((h1, eri))
                dh1 = (hs[0][0] - hs[1][0]) / (2 * step)
                deri = (hs[0][1] - hs[1][1]) / (2 * step)
                out[A, x] = _trans_element(ci_i, ci_j, dh1, deri,
                                           mc.ncas, mc.nelecas) / de
        return out
