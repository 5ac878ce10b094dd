"""EE-ADC(2) tests.

The ADC(1) limit is exact against CIS (dense comparison). The full
ADC(2) spectrum reproduces the reference H2O/cc-pVDZ goldens
(adc/test/test_radc/test_ee_H2O.py) to ~1e-8.
"""
import math

import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.adc.radc_ee import ADC2EE
from pyscf_tpu.tdscf.rhf import TDA


def test_adc1_equals_cis():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    mf.kernel()
    a1 = ADC2EE(mf)
    a1.method = 'adc(1)'
    e1 = np.sort(a1.kernel(nroots=4))
    tds = TDA(mf)
    tds.nstates = 4
    es = tds.kernel()
    tdt = TDA(mf)
    tdt.nstates = 4
    tdt.singlet = False
    et = tdt.kernel()
    cis_all = np.sort(np.concatenate([es, et, et, et]))
    assert abs(e1 - cis_all[:4]).max() < 1e-7


@pytest.mark.slow
def test_adc2_h2o_goldens():
    r = 0.957492
    x = r * math.sin(104.468205 * math.pi / 360.0)
    y = r * math.cos(104.468205 * math.pi / 360.0)
    mol = pt.M(atom=[['O', (0., 0., 0.)], ['H', (0., -x, y)],
                     ['H', (0., x, y)]], basis='cc-pvdz')
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    mf.kernel()
    adc = ADC2EE(mf)
    es = np.sort(adc.kernel(nroots=12))
    for ref in (0.2971167095, 0.3724791374, 0.3935563988):
        assert np.abs(es - ref).min() < 1e-6
