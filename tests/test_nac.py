"""Nonadiabatic coupling (CI contribution) tests.

Oracle: in the frozen-orbital picture,
<c_I|dH/dR|c_J>/(E_J - E_I) == <c_I(R) | dc_J/dR> exactly (first-order
perturbation theory), so the coupling is checked against central-
difference overlaps of CI vectors solved at displaced geometries with
fixed MO coefficients.
"""
import numpy as np

import pyscf_tpu as pt
from pyscf_tpu.fci import direct_spin1
from pyscf_tpu.mcscf import CASCI
from pyscf_tpu.nac import NACCASCI, _cas_hamiltonian


def test_nac_casci_vs_fd():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.init_guess = 'hcore'
    mf.kernel()
    mc = CASCI(mf, 4, 4)
    h1, ecore = mc.h1e_for_cas()
    eri = mc.get_h2eff()
    es, cis = direct_spin1.kernel(h1, eri, 4, mc.nelecas, ecore=ecore,
                                  nroots=2)
    mc.ci = list(cis)
    mc.e_states = np.asarray(es)

    d = NACCASCI(mc).kernel(0, 1)

    mo = np.asarray(mc.mo_coeff)
    coords0 = np.asarray(mol.coords).copy()
    step = 1e-4
    ci0, ci1 = np.asarray(mc.ci[0]), np.asarray(mc.ci[1])
    fd = np.zeros((mol.natm, 3))
    for A in range(mol.natm):
        for x in range(3):
            ovs = []
            for sgn in (1.0, -1.0):
                c = coords0.copy()
                c[A, x] += sgn * step
                m2 = mol.copy()
                m2.set_geom_(c)
                h1d, erid, ecd = _cas_hamiltonian(mc, m2, mo)
                esd, cisd = direct_spin1.kernel(h1d, erid, 4, mc.nelecas,
                                                ecore=ecd, nroots=2)
                cj = np.asarray(cisd[1])
                if np.sum(cj * ci1) < 0:
                    cj = -cj
                ovs.append(np.sum(ci0 * cj))
            fd[A, x] = (ovs[0] - ovs[1]) / (2 * step)
    assert abs(d - fd).max() < 1e-6
    # couplings are antisymmetric under state exchange
    d10 = NACCASCI(mc).kernel(1, 0)
    assert abs(d + d10).max() < 1e-8
