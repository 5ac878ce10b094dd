"""CCSDT: oracle-certified residuals + golden energies.

The fast tier verifies the jitted einsum residuals against the exact
Fock-space oracle (cc/fock_oracle.py) on random non-hermitian tensors —
the strongest possible unit test of the working equations.  The slow
tier reproduces the reference RCCSDT golden (cc/test/test_rccsdt.py:79).
"""
import numpy as np
import pytest
import jax.numpy as jnp

import pyscf_tpu as pt
from pyscf_tpu.cc import fock_oracle as fo
from pyscf_tpu.cc.gccsdt import _residuals, GCCSDT


@pytest.mark.parametrize('nocc,nvir,seed', [(3, 4, 0), (5, 4, 5)])
def test_residuals_vs_fock_oracle(nocc, nvir, seed):
    f, w, _, t2, t3 = fo.random_problem(nocc, nvir, seed=seed)
    n = nocc + nvir
    o = slice(0, nocc)
    fN = f + np.einsum('piqi->pq', w[:, o, :, o])
    r1, r2, r3 = _residuals(jnp.asarray(fN), jnp.asarray(w),
                            jnp.asarray(t2), jnp.asarray(t3), nocc)
    vec = fo.similarity_residual(f, w, nocc, t2=t2, t3=t3)
    assert abs(np.asarray(r1) - fo.project_singles(vec, n, nocc)).max() < 1e-11
    assert abs(np.asarray(r2) - fo.project_doubles(vec, n, nocc)).max() < 1e-11
    assert abs(np.asarray(r3) - fo.project_triples(vec, n, nocc)).max() < 1e-11


def test_ccsdt_equals_fci_three_electrons():
    """CCSDT is exact for 3-electron systems."""
    from pyscf_tpu.fci import direct_spin1
    from pyscf_tpu import ao2mo
    mol = pt.M(atom='H 0 0 0; H 0 0 1.1; H 0 0 2.0', basis='sto-3g',
               spin=1, verbose=0)
    mf = mol.UHF()
    mf.kernel()
    mfr = mol.ROHF()
    mfr.kernel()
    c = np.asarray(mfr.mo_coeff)
    h1 = c.T @ np.asarray(mfr.get_hcore()) @ c
    eri_mo = np.asarray(ao2mo.full(mol.intor('int2e'), c))
    e_fci, _ = direct_spin1.kernel(h1, eri_mo, mol.nao, (2, 1),
                                   ecore=float(mol.energy_nuc()))
    cc = GCCSDT(mf)
    cc.verbose = 0
    cc.conv_tol = 1e-10
    cc.kernel()
    assert cc.converged
    assert abs(cc.e_tot - e_fci) < 1e-8


@pytest.mark.slow
def test_ccsdt_h2o_631g_golden():
    """Reference cc/test/test_rccsdt.py:79 — H2O/6-31G RCCSDT."""
    mol = pt.M(atom=[['O', (0., 0., 0.)],
                     ['H', (0., -0.757, 0.587)],
                     ['H', (0., 0.757, 0.587)]],
               basis='6-31g', verbose=0)
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.kernel()
    cc = GCCSDT(mf)
    cc.verbose = 0
    cc.conv_tol = 1e-9
    e_corr = cc.kernel()
    assert cc.converged
    assert abs(e_corr - (-0.1364767434621007)) < 1e-7
