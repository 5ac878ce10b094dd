"""CCSDTQ: oracle-certified residuals + FCI identity for 4 electrons."""
import numpy as np
import pytest
import jax.numpy as jnp

import pyscf_tpu as pt


def test_r4_residual_vs_fock_oracle():
    from pyscf_tpu.cc import fock_oracle as fo
    from pyscf_tpu.cc.gccsdtq import _r4_and_feedback
    from pyscf_tpu.cc.gccsdt import _residuals
    nocc, nvir, seed = 4, 4, 1
    f, w, _, t2, t3 = fo.random_problem(nocc, nvir, seed=seed)
    rng = np.random.RandomState(seed + 1000)
    t4 = rng.uniform(-1, 1, (nocc,) * 4 + (nvir,) * 4)
    t4 = fo._antisymmetrize(t4, 4) / 576.0
    n = nocc + nvir
    o = slice(0, nocc)
    fN = f + np.einsum('piqi->pq', w[:, o, :, o])
    r1, r2, r3 = _residuals(jnp.asarray(fN), jnp.asarray(w),
                            jnp.asarray(t2), jnp.asarray(t3), nocc)
    r2t4, r3t4, r4 = _r4_and_feedback(jnp.asarray(fN), jnp.asarray(w),
                                      jnp.asarray(t2), jnp.asarray(t3),
                                      jnp.asarray(t4), nocc)
    vec = fo.similarity_residual(f, w, nocc, t2=t2, t3=t3, t4=t4)
    assert abs(np.asarray(r1)
               - fo.project_singles(vec, n, nocc)).max() < 1e-11
    assert abs(np.asarray(r2 + r2t4)
               - fo.project_doubles(vec, n, nocc)).max() < 1e-11
    assert abs(np.asarray(r3 + r3t4)
               - fo.project_triples(vec, n, nocc)).max() < 1e-11
    assert abs(np.asarray(r4)
               - fo.project_quadruples(vec, n, nocc)).max() < 1e-10


@pytest.mark.slow
def test_ccsdtq_equals_fci_4e():
    """CCSDTQ is exact for 4-electron systems (LiH)."""
    from pyscf_tpu.fci import direct_spin1
    from pyscf_tpu import ao2mo
    from pyscf_tpu.cc.gccsdtq import GCCSDTQ
    mol = pt.M(atom='Li 0 0 0; H 0 0 1.6', basis='sto-3g', verbose=0)
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.kernel()
    c = np.asarray(mf.mo_coeff)
    h1 = c.T @ np.asarray(mf.get_hcore()) @ c
    eri_mo = np.asarray(ao2mo.full(mol.intor('int2e'), c))
    e_fci, _ = direct_spin1.kernel(h1, eri_mo, mol.nao, (2, 2),
                                   ecore=float(mol.energy_nuc()))
    cc = GCCSDTQ(mf)
    cc.verbose = 0
    cc.conv_tol = 1e-10
    cc.kernel()
    assert cc.converged
    assert abs(cc.e_tot - e_fci) < 1e-8
