"""ECP (effective core potential) integrals and SCF.

Golden values from the reference test suite
(pyscf/gto/test/test_ecp.py test_nr_rhf: NaH RHF/lanl2dz = -0.45002315563472206).
"""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.ops import eval_gto
from pyscf_tpu.ops.integrals import ecp as ecpmod
from pyscf_tpu.ops.integrals.cart2sph import _real_sph_harm
from pyscf_tpu.dft.lebedev import lebedev_grid


def test_itilde_vs_scipy():
    from scipy.special import ive
    ts = np.array([0.0, 1e-12, 1e-6, 0.01, 0.7, 5.0, 40.0, 99.0, 101.0,
                   1e4, 1e8])
    lmax = 9
    got = np.asarray(ecpmod.itilde(ts, lmax))
    for i, t in enumerate(ts):
        for l in range(lmax + 1):
            if t == 0:
                ref = 1.0 if l == 0 else 0.0
            else:
                ref = float(np.sqrt(np.pi / (2 * t)) * ive(l + 0.5, t))
            if abs(ref) > 1e-200:
                assert abs(got[i, l] - ref) / abs(ref) < 1e-11, (t, l)
            else:
                assert abs(got[i, l]) < 1e-200


def test_ecp_vs_bruteforce_quadrature():
    """Engine vs independent dense radial x Lebedev numeric integration."""
    b = [[0, [0.8, 1.0], [0.3, 0.5]], [1, [0.5, 1.0]], [2, [0.7, 1.0]]]
    mol = pt.M(atom='He 0 0 0; He 0.9 0.2 1.1', basis={'He': b}, unit='bohr')
    pots = [[-1, [[1, 1.2, -3.0], [2, 2.0, 5.0]]],
            [0, [[0, 2.5, 3.0], [2, 1.5, 10.0]]],
            [1, [[2, 1.8, 7.5], [1, 1.1, 2.0]]]]
    mol._ecp = {0: [2, pots]}
    V = np.asarray(ecpmod.ecp_scalar(mol))

    nr = 600
    x = np.linspace(np.log(1e-9), np.log(45.0), nr)
    r = np.exp(x)
    wr = r * (x[1] - x[0])
    pts, wa = lebedev_grid(1202)
    coords = (mol.coords[0][None, None, :]
              + r[:, None, None] * pts[None, :, :]).reshape(-1, 3)
    ao = np.asarray(eval_gto.eval_ao(mol, coords)).reshape(
        nr, len(pts), mol.nao)

    def U(rows, rr):
        u = np.zeros_like(rr)
        for n, a, c in rows:
            u += c * rr ** (n - 2) * np.exp(-a * rr * rr)
        return u

    Vref = np.zeros((mol.nao, mol.nao))
    for l, rows in pots:
        if l < 0:
            W = (wr * r ** 2 * U(rows, r))[:, None] * (4 * np.pi * wa)[None, :]
            Vref += np.einsum('ra,rai,raj->ij', W, ao, ao, optimize=True)
        else:
            Y = _real_sph_harm(l, pts)
            proj = np.einsum('ma,rai,a->rmi', Y, ao, 4 * np.pi * wa)
            Vref += np.einsum('r,rmi,rmj->ij', wr * r ** 2 * U(rows, r),
                              proj, proj, optimize=True)
    assert np.abs(V - Vref).max() < 1e-8


def test_nah_lanl2dz_rhf_golden():
    mol = pt.M(atom='Na 0. 0. 0.; H 0. 0. 1.',
               basis={'Na': 'lanl2dz', 'H': 'sto3g'},
               ecp={'Na': 'lanl2dz'}, verbose=0)
    assert mol.nelectron == 2
    assert mol.atom_nelec_core(0) == 10
    mf = pt.scf.RHF(mol)
    e = mf.kernel()
    assert mf.converged
    assert abs(e - -0.45002315563472206) < 1e-8
