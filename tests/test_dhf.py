"""4-component Dirac-HF validation (reference scf/test/test_dhf.py
strategy: nonrelativistic limit + one-electron exactness).

- one electron: J-K must cancel exactly, so E_DHF equals the lowest
  positive-energy eigenvalue of the one-electron Dirac matrix — this
  exercises the (SS|LL)/(SS|SS) blocks' internal consistency.
- c -> infinity: DHF must reduce to the nonrelativistic RHF energy.
- real c: relativistic stabilization with the right sign and magnitude.
"""
import numpy as np
import pytest
import scipy.linalg

import pyscf_tpu as pt
from pyscf_tpu.lib.parameters import LIGHT_SPEED
from pyscf_tpu.scf.dhf import DHF, dirac_hcore


def test_dhf_one_electron_exact():
    mol = pt.M(atom='H 0 0 0', basis='sto-3g', spin=1, verbose=0)
    mf = DHF(mol)
    e = mf.kernel()
    assert mf.converged
    h, m = dirac_hcore(mol)
    ev = scipy.linalg.eigh(h, m, eigvals_only=True)
    e1 = ev[2 * mol.nao]          # lowest positive-energy state
    assert abs(e - e1) < 1e-10


def test_dhf_nonrelativistic_limit():
    mol = pt.M(atom='He 0 0 0', basis='cc-pvdz', verbose=0)
    rhf = mol.RHF()
    rhf.conv_tol = 1e-12
    e_nr = rhf.kernel()
    # residual correction scales as 1/c^2: -1.24e-4 Ha at the real c
    # becomes ~ -1.2e-8 at 100c (larger c makes the SS metric ~ T/2c^2
    # numerically singular)
    mf = DHF(mol, c=LIGHT_SPEED * 1e2)
    e4c = mf.kernel()
    assert mf.converged
    assert abs(e4c - e_nr) < 5e-8


def test_dhf_relativistic_correction():
    mol = pt.M(atom='He 0 0 0', basis='cc-pvdz', verbose=0)
    rhf = mol.RHF()
    rhf.conv_tol = 1e-12
    e_nr = rhf.kernel()
    mf = DHF(mol)
    e4c = mf.kernel()
    assert mf.converged
    # relativistic stabilization: small and negative for He
    assert e4c < e_nr
    assert e_nr - e4c < 5e-3
    # (SS|SS) is a tiny repulsive correction at this Z
    mf2 = DHF(mol, with_ssss=False)
    e_nossss = mf2.kernel()
    assert abs(e4c - e_nossss) < 1e-5
    assert e4c != e_nossss


@pytest.mark.slow
def test_dhf_h2o_631g_reference_golden():
    """Many-electron DHF vs the reference golden
    (scf/test/test_dhf.py:92-93 test_scf: -76.038520455193833)."""
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='6-31g', verbose=0)
    mf = DHF(mol)
    e = mf.kernel()
    assert abs(e - (-76.038520455193833)) < 1e-8
