"""Molecule construction + integral correctness tests.

Golden scalars cross-checked against the reference test suite
(pyscf/scf/test/test_h2o_vdz.py geometry) and exact analytic limits.
"""
import numpy as np
import pytest

import pyscf_tpu as pt


@pytest.fixture(scope='module')
def h2o_sto3g():
    return pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
                basis='sto-3g', verbose=0)


def test_build(h2o_sto3g):
    mol = h2o_sto3g
    assert mol.nao == 7
    assert mol.nbas == 5
    assert mol.nelec == (5, 5)
    assert abs(mol.energy_nuc() - 9.188258417746113) < 1e-8


def test_overlap_normalized(h2o_sto3g):
    s = np.asarray(h2o_sto3g.intor('int1e_ovlp'))
    assert abs(s.diagonal() - 1.0).max() < 1e-12
    assert abs(s - s.T).max() < 1e-13


def test_overlap_normalized_dz():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='cc-pvdz', verbose=0)
    s = np.asarray(mol.intor('int1e_ovlp'))
    assert abs(s.diagonal() - 1.0).max() < 1e-12


def test_h_atom_energy():
    """1-electron eigenvalue of H in cc-pVDZ: kin+nuc validated together."""
    import scipy.linalg as sl
    h = pt.M(atom='H 0 0 0', basis='cc-pvdz', spin=1, verbose=0)
    hmat = np.asarray(h.intor('int1e_kin')) + np.asarray(h.intor('int1e_nuc'))
    s = np.asarray(h.intor('int1e_ovlp'))
    w = sl.eigh(hmat, s, eigvals_only=True)
    # HF = exact 1e energy for H; cc-pVDZ value ~ -0.499278
    assert abs(w[0] - (-0.499278)) < 1e-5


def test_h2_eri():
    """Textbook H2/STO-3G ERI values."""
    mol = pt.M(atom='H 0 0 0; H 0 0 0.74', basis='sto-3g', verbose=0)
    eri = np.asarray(mol.intor('int2e'))
    assert abs(eri[0, 0, 0, 0] - 0.774606) < 1e-5
    assert abs(eri[0, 0, 1, 1] - 0.569995) < 1e-5
    # 8-fold permutation symmetry
    assert abs(eri - eri.transpose(1, 0, 2, 3)).max() < 1e-12
    assert abs(eri - eri.transpose(2, 3, 0, 1)).max() < 1e-12


def test_boys_vs_hyp1f1():
    from scipy.special import hyp1f1
    import jax.numpy as jnp
    from pyscf_tpu.ops.integrals.boys import boys
    T = np.array([0.0, 1e-8, 0.1, 1.0, 5.0, 20.0, 34.9, 35.1, 50.0, 200.0])
    F = np.asarray(boys(16, jnp.asarray(T)))
    ref = np.array([[hyp1f1(m + 0.5, m + 1.5, -t) / (2 * m + 1) for t in T]
                    for m in range(17)])
    assert np.abs((F - ref) / ref).max() < 1e-12


def test_int2c2e_vs_int2e():
    """(P|Q) must equal the ss-limit of (ab|cd) structure: check vs known
    integral for two s-Gaussians: (a|b) = 2 pi^2.5 / (ab sqrt(a+b)) F0."""
    import jax.numpy as jnp
    mol = pt.M(atom='He 0 0 0; He 0 0 1.0', basis={'He': [[0, [1.5, 1.0]]]},
               verbose=0)
    v = np.asarray(mol.intor('int2c2e'))
    a = b = 1.5
    from pyscf_tpu.ops.integrals.boys import boys
    from pyscf_tpu.gto.mole import gto_norm
    R = 1.0 / 0.52917721092
    T = a * b / (a + b) * R * R
    F0 = float(boys(0, jnp.asarray(T))[0])
    norm = gto_norm(0, 1.5) * 0.28209479177387814
    ref = 2 * np.pi ** 2.5 / (a * b * np.sqrt(a + b)) * F0 * norm ** 2
    assert abs(v[0, 1] - ref) < 1e-12


def test_dipole_integrals(h2o_sto3g):
    r = np.asarray(h2o_sto3g.intor('int1e_r'))
    assert r.shape == (3, 7, 7)
    for d in range(3):
        assert abs(r[d] - r[d].T).max() < 1e-12
