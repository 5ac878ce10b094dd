"""SC-NEVPT2 tests.

1. Exact validation: every perturber class against a brute-force full-Fock-
   space projection P_mu H |Psi0> on random integrals (catches any operator/
   sign/factor error mechanically).
2. Reference golden: H14 chain / STO-3G CASCI(6,8)
   (pyscf/mrpt/test/test_nevpt2.py, values from Dalton): E2 = -0.1031529251.
"""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.fci import cistring, direct_spin1
from pyscf_tpu.mrpt import nevpt2 as nv


def test_classes_vs_fock_space_projection():
    rng = np.random.default_rng(7)
    norb, nc, ncas, nvirt = 5, 1, 2, 2
    nelec_full = (2, 2)
    h1 = rng.standard_normal((norb, norb))
    h1 = (h1 + h1.T) / 2
    eri = rng.standard_normal((norb,) * 4)
    eri = eri + eri.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)
    eri /= 8
    h1[0, 0] -= 10.0
    A = slice(nc, nc + ncas)
    heff = (h1 + 2.0 * np.einsum('pqjj->pq', eri[:, :, :nc, :nc])
            - np.einsum('pjjq->pq', eri[:, :nc, :nc, :]))
    nelecas = (1, 1)
    e_cas, ci0 = direct_spin1.kernel(heff[A, A], eri[A, A, A, A], ncas,
                                     nelecas)
    ci0 = np.asarray(ci0)
    eps_c = np.array([-1.3])
    eps_v = np.array([0.7, 1.1])
    _, res = nv._sc_from_mo(eri, heff, eps_c, eps_v, nc, ncas, ci0, nelecas)

    # exact projection in the full 5-orbital Fock space
    na_full = cistring.num_strings(norb, 2)
    strs = cistring.make_strings(norb, 2)
    ci_full = np.zeros((na_full, na_full))
    act_strs = cistring.make_strings(ncas, 1)
    for ia, sa in enumerate(act_strs):
        for ib, sb in enumerate(act_strs):
            fa = 1 | (int(sa) << nc)
            fb = 1 | (int(sb) << nc)
            ci_full[cistring.str2addr(norb, 2, fa),
                    cistring.str2addr(norb, 2, fb)] = ci0[ia, ib]
    h2e = direct_spin1.absorb_h1e(h1, eri, norb, nelec_full, 0.5)
    Hpsi = np.asarray(direct_spin1.contract_2e(h2e, ci_full, norb,
                                               nelec_full))

    def occ(s, p):
        return (s >> p) & 1

    core_occ = np.array([[occ(int(s), p) for p in range(nc)] for s in strs])
    virt_occ = np.array([[occ(int(s), nc + ncas + p) for p in range(nvirt)]
                         for s in strs])

    def project(ct_t, vt_t):
        phi = np.zeros_like(Hpsi)
        for IA in range(na_full):
            for IB in range(na_full):
                if Hpsi[IA, IB] == 0:
                    continue
                ct = core_occ[IA] + core_occ[IB]
                vt = virt_occ[IA] + virt_occ[IB]
                if np.array_equal(ct, ct_t) and np.array_equal(vt, vt_t):
                    phi[IA, IB] = Hpsi[IA, IB]
        return phi

    def hd_act(phi):
        nrm = np.linalg.norm(phi.ravel())
        dm1, dm2 = direct_spin1.make_rdm12(phi / nrm, norb, nelec_full)
        return (np.einsum('pq,pq->', heff[A, A], np.asarray(dm1)[A, A])
                + 0.5 * np.einsum('pqrs,pqrs->', eri[A, A, A, A],
                                  np.asarray(dm2)[A, A, A, A]))

    checks = {
        'Sr': [([2], [1, 0], eps_v[0]), ([2], [0, 1], eps_v[1])],
        'Si': [([1], [0, 0], -eps_c[0])],
        'Srs': [([2], [2, 0], 2 * eps_v[0]), ([2], [0, 2], 2 * eps_v[1]),
                ([2], [1, 1], eps_v[0] + eps_v[1])],
        'Sij': [([0], [0, 0], -2 * eps_c[0])],
        'Srsi': [([1], [2, 0], 2 * eps_v[0] - eps_c[0]),
                 ([1], [0, 2], 2 * eps_v[1] - eps_c[0]),
                 ([1], [1, 1], eps_v[0] + eps_v[1] - eps_c[0])],
        'Sijr': [([0], [1, 0], eps_v[0] - 2 * eps_c[0]),
                 ([0], [0, 1], eps_v[1] - 2 * eps_c[0])],
        'Sir': [([1], [1, 0], eps_v[0] - eps_c[0]),
                ([1], [0, 1], eps_v[1] - eps_c[0])],
        'Sijrs': [([0], [2, 0], 2 * eps_v[0] - 2 * eps_c[0]),
                  ([0], [0, 2], 2 * eps_v[1] - 2 * eps_c[0]),
                  ([0], [1, 1], eps_v[0] + eps_v[1] - 2 * eps_c[0])],
    }
    for name, inst in checks.items():
        tot_n, tot_e = 0.0, 0.0
        for ct, vt, de in inst:
            phi = project(np.array(ct), np.array(vt))
            n = float((phi * phi).sum())
            if n < 1e-12:
                continue
            if name == 'Sijrs':
                tot_e += -n / de
            else:
                tot_e += -n / (de + hd_act(phi) - e_cas)
            tot_n += n
        assert abs(tot_n - res[name][0]) < 1e-9, name
        assert abs(tot_e - res[name][1]) < 1e-9, name


def test_h14_nevpt2_golden():
    atoms = [('H', (0, 0, z)) for z in
             [0., 0.8, 2., 2.8, 4., 4.8, 6., 6.8, 8., 8.8, 10., 10.8,
              12., 12.8]]
    mol = pt.M(atom=atoms, basis='sto3g', verbose=0)
    mf = pt.scf.RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    assert mf.converged
    from pyscf_tpu.mcscf import CASCI
    mc = CASCI(mf, 6, 8)
    mc.kernel()
    e2, res = nv.sc_nevpt2(mc)
    gold = {'Sr': (0.039479583324952064, -0.0202461540),
            'Si': (0.0037402334190064367, -0.0021282083),
            'Sijrs': (0.023107592349719219, -0.0071505004),
            'Sijr': (0.012664066951786257, -0.0050346117),
            'Srsi': (0.040695892654346914, -0.0136954715),
            'Srs': (0.056323606234166601, -0.0175312323),
            'Sir': (0.074269050656629421, -0.0338666048)}
    for k, (gn, ge) in gold.items():
        assert abs(res[k][0] - gn) < 1e-6, k
        assert abs(res[k][1] - ge) < 3e-6, k
    assert abs(e2 - -0.1031529251) < 3e-6
