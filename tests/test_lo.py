"""Orbital localization tests (reference analog: pyscf/lo/test/).

Contract: localized orbitals stay orthonormal in the AO overlap metric,
span the same occupied space (invariant density matrix), and strictly
increase their localization metric relative to canonical MOs.
"""
import numpy as np
import pytest

from pyscf_tpu.gto.mole import Mole
from pyscf_tpu.scf.hf import RHF
from pyscf_tpu import lo
from pyscf_tpu.ao2mo import full as ao2mo_full


@pytest.fixture(scope='module')
def h2o():
    mol = Mole(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g', verbose=0).build()
    mf = RHF(mol)
    mf.kernel()
    nocc = mol.nelectron // 2
    cocc = np.asarray(mf.mo_coeff)[:, :nocc]
    s1 = np.asarray(mol.intor('int1e_ovlp'))
    return mol, cocc, s1


def test_iao(h2o):
    mol, cocc, s1 = h2o
    a = lo.iao(mol, cocc)
    # minao for H2O = 5 O functions + 2 H functions = 7 IAOs
    assert a.shape == (mol.nao, 7)
    assert abs(a.T @ s1 @ a - np.eye(a.shape[1])).max() < 1e-10
    # occupied space is contained in the IAO span
    p = a @ np.linalg.solve(a.T @ s1 @ a, a.T @ s1)
    assert abs(p @ cocc - cocc).max() < 1e-10
    # IAO Mulliken-style charges sum to the electron count
    dm = 2.0 * cocc @ cocc.T
    q = np.diag(a.T @ s1 @ dm @ s1 @ a)
    assert abs(q.sum() - mol.nelectron) < 1e-8


def test_ibo(h2o):
    mol, cocc, s1 = h2o
    mo = lo.ibo(mol, cocc)
    n = cocc.shape[1]
    assert abs(mo.T @ s1 @ mo - np.eye(n)).max() < 1e-7
    assert abs(mo @ mo.T - cocc @ cocc.T).max() < 1e-7


def test_nao_npa(h2o):
    mol, cocc, s1 = h2o
    dm = 2.0 * cocc @ cocc.T
    c = lo.nao(mol, dm=dm)
    assert abs(c.T @ s1 @ c - np.eye(mol.nao)).max() < 1e-10
    q = lo.npa_charges(mol, dm=dm)
    assert abs(q.sum()) < 1e-7          # neutral molecule
    assert q[0] < -0.2                  # O negative, H positive
    assert q[1] > 0.1 and q[2] > 0.1


def test_cholesky_mos(h2o):
    mol, cocc, s1 = h2o
    L = lo.cholesky_mos(cocc)
    n = cocc.shape[1]
    assert abs(L @ L.T - cocc @ cocc.T).max() < 1e-10
    assert abs(L.T @ s1 @ L - np.eye(n)).max() < 1e-8


def test_edmiston_ruedenberg(h2o):
    mol, cocc, s1 = h2o

    def self_rep(mo):
        n = mo.shape[1]
        g = np.asarray(ao2mo_full(mol, mo)).reshape(n, n, n, n)
        return sum(g[i, i, i, i] for i in range(n))

    mo = lo.edmiston_ruedenberg(mol, cocc)
    n = cocc.shape[1]
    assert abs(mo.T @ s1 @ mo - np.eye(n)).max() < 1e-7
    assert abs(mo @ mo.T - cocc @ cocc.T).max() < 1e-7
    assert self_rep(mo) > self_rep(cocc) + 0.1
