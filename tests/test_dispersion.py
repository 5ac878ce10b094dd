"""DFT-D2 dispersion tests (Grimme 2006 model, native implementation)."""
import numpy as np

import pyscf_tpu as pt
from pyscf_tpu.scf.dispersion import d2_energy, dftd


def test_d2_r6_decay():
    e1 = d2_energy(pt.M(atom='Ne 0 0 0; Ne 0 0 3.1', basis='sto-3g'), 'pbe')
    e2 = d2_energy(pt.M(atom='Ne 0 0 0; Ne 0 0 6.2', basis='sto-3g'), 'pbe')
    assert e1 < 0 and e2 < 0
    assert 50 < e1 / e2 < 70          # ~2^6 with damping ~1


def test_d2_gradient_fd():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    e, g = d2_energy(mol, 'b3lypg', with_grad=True)
    step = 1e-6
    c0 = np.asarray(mol.coords).copy()
    for A in range(mol.natm):
        for x in range(3):
            cp = c0.copy()
            cp[A, x] += step
            m2 = mol.copy()
            m2.set_geom_(cp)
            cm = c0.copy()
            cm[A, x] -= step
            m3 = mol.copy()
            m3.set_geom_(cm)
            fd = (d2_energy(m2, 'b3lypg') - d2_energy(m3, 'b3lypg')) \
                / (2 * step)
            assert abs(fd - g[A, x]) < 1e-8


def test_d2_attach():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.init_guess = 'hcore'
    dftd(mf, 'd2', 'b3lyp')
    e = mf.kernel()
    assert mf.e_disp < 0
    assert abs((e - mf.e_disp) - -74.9630631297) < 5e-8


def test_d3_gated():
    import pytest
    mol = pt.M(atom='H 0 0 0; H 0 0 0.74', basis='sto-3g')
    mf = mol.RHF()
    with pytest.raises(NotImplementedError):
        dftd(mf, 'd3bj')
