"""DFT+U tests.

Golden: reference dft/test/test_dftu.py:28 — H2O/6-31G PBE+U(O 2p, 3.5 eV)
linear-response U = 5.8926 eV (Cococcioni-de Gironcoli).
"""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.dft.rkspu import RKSpU, linear_response_u


@pytest.mark.slow
def test_rkspu_linear_response():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='6-31g')
    mf = RKSpU(mol, xc='pbe,pbe', U_idx=['O 2p'], U_val=[3.5])
    mf.conv_tol = 1e-10
    mf.kernel()
    assert mf.converged
    assert mf._e_u > 0
    u0 = linear_response_u(mf)
    assert abs(u0 - 5.8926) < 0.05


def test_rkspu_limits():
    """U=0 reduces exactly to RKS; U>0 raises the energy of a fractional
    local occupation."""
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf0 = pt.dft.RKS(mol, xc='lda,vwn')
    e0 = mf0.kernel()
    mf1 = RKSpU(mol, xc='lda,vwn', U_idx=['O 2p'], U_val=[0.0])
    e1 = mf1.kernel()
    assert abs(e1 - e0) < 1e-9
    mf2 = RKSpU(mol, xc='lda,vwn', U_idx=['O 2p'], U_val=[5.0])
    e2 = mf2.kernel()
    assert mf2.converged
    assert e2 > e0          # penalty for fractional occupancy
