"""ddPCM: physics + limiting-case checks (reference solvent/ddpcm.py is
itself flagged 'in testing', so the oracles are analytic):

  * single charged sphere -> exact dielectric Born energy,
  * eps -> infinity: A_eps -> A_inf so ddPCM == ddCOSMO identically,
  * finite eps: water-in-water solvation close to but distinct from
    the conductor-like ddCOSMO value.
"""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.solvent.ddcosmo import DDCOSMO, ddcosmo_for_scf
from pyscf_tpu.solvent.ddpcm import DDPCM, ddpcm_for_scf

ATOM = 'O 0 0 0.1174; H 0 0.7572 -0.4696; H 0 -0.7572 -0.4696'


def test_ddpcm_born_limit():
    mol = pt.M(atom='He 0 0 0', basis='sto-3g', verbose=0)
    sol = DDPCM(mol, eps=78.3553)
    sol.build()
    dm = np.zeros((mol.nao, mol.nao))
    e, v = sol._get_vind(dm)
    R = sol.r_vdw[0]
    f_eps = (sol.eps - 1.0) / sol.eps
    born = -0.5 * f_eps * 4.0 / R
    assert abs(e - born) / abs(born) < 1e-6


def test_ddpcm_conductor_limit_matches_ddcosmo():
    mol = pt.M(atom=ATOM, basis='sto-3g', verbose=0)
    dm = np.asarray(mol.RHF().get_init_guess())
    eps = 1e8
    e1, v1 = DDCOSMO(mol, eps=eps)._get_vind(dm)
    e2, v2 = DDPCM(mol, eps=eps)._get_vind(dm)
    assert abs(e1 - e2) < 1e-8
    assert np.abs(np.asarray(v1) - np.asarray(v2)).max() < 1e-8


def test_ddpcm_water_scf():
    mol = pt.M(atom=ATOM, basis='sto-3g', verbose=0)
    e_gas = mol.RHF().kernel()
    mf = ddpcm_for_scf(mol.RHF())
    e_pcm = mf.kernel()
    assert mf.converged
    de_pcm = e_pcm - e_gas
    assert -0.02 < de_pcm < -0.003       # chemically sensible stabilization
    mf2 = ddcosmo_for_scf(mol.RHF())
    e_cosmo = mf2.kernel()
    de_cosmo = e_cosmo - e_gas
    # true-dielectric vs conductor-like: close but not identical
    assert abs(de_pcm - de_cosmo) / abs(de_cosmo) < 0.2
    assert abs(de_pcm - de_cosmo) > 1e-8
