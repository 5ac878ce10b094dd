"""Gradient tests: analytic vs finite differences (the reference's own
cross-validation strategy, grad/test/test_rhf.py:148)."""
import numpy as np
import pytest

import pyscf_tpu as pt

ATOM = 'O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587'


@pytest.mark.slow
def test_rhf_grad_vs_fd():
    mol = pt.M(atom=ATOM, basis='sto-3g', verbose=0)
    mf = mol.RHF()
    mf.verbose = 0
    mf.conv_tol = 1e-12
    mf.kernel()
    from pyscf_tpu.grad.rhf import Gradients, finite_difference_gradient
    g = np.asarray(Gradients(mf).kernel())

    def efac(m):
        f = m.RHF()
        f.verbose = 0
        f.conv_tol = 1e-12
        return f.kernel()

    gfd = finite_difference_gradient(efac, mol, 1e-4)
    assert abs(g - gfd).max() < 1e-6
    # translational invariance
    assert abs(g.sum(axis=0)).max() < 1e-9


def test_grad_nuc():
    mol = pt.M(atom='H 0 0 0; H 0 0 0.74', basis='sto-3g', verbose=0)
    from pyscf_tpu.grad.rhf import grad_nuc
    g = grad_nuc(mol)
    r = 0.74 / 0.52917721092
    assert abs(g[0, 2] - 1.0 / r ** 2) < 1e-10
    assert abs(g.sum(axis=0)).max() < 1e-12
