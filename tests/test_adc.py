"""RADC(2)/(2)-x IP and EA against reference goldens
(pyscf/adc/test/test_radc/test_ip_H2O.py, test_ea_H2O.py)."""
import math

import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.adc import ADC, RADCIP, RADCEA

r = 0.957492
x = r * math.sin(104.468205 * math.pi / 360)
y = r * math.cos(104.468205 * math.pi / 360)
GEOM = [('O', (0, 0, 0)), ('H', (0, -x, y)), ('H', (0, x, y))]


def _rhf(basis):
    mol = pt.M(atom=GEOM, basis=basis, verbose=0)
    mf = pt.scf.RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    assert mf.converged
    return mf


def test_ip_adc2_and_2x():
    mf = _rhf('cc-pvdz')
    myadc = ADC(mf)
    e_mp2, _, _ = myadc.kernel_gs()
    assert abs(e_mp2 - -0.2039852016968376) < 1e-8
    e, u, p, _ = RADCIP(myadc).kernel(nroots=3)
    ref_e = [0.4034634878946100, 0.4908881395275673, 0.6573303400764507]
    ref_p = [1.8162558898737797, 1.8274312312239454, 1.8582314560275948]
    np.testing.assert_allclose(e, ref_e, atol=1e-6)
    np.testing.assert_allclose(p, ref_p, atol=1e-6)

    myadc2x = ADC(mf, method='adc(2)-x')
    myadc2x.kernel_gs()
    e, u, p, _ = RADCIP(myadc2x).kernel(nroots=3)
    ref_e = [0.4085610789192171, 0.4949784593692911, 0.6602619900185128]
    ref_p = [1.8296221555740104, 1.8381884804163264, 1.8669268953278064]
    np.testing.assert_allclose(e, ref_e, atol=1e-6)
    np.testing.assert_allclose(p, ref_p, atol=1e-6)


@pytest.mark.slow
def test_ea_adc2():
    mf = _rhf('aug-cc-pvdz')
    myadc = ADC(mf)
    e_mp2, _, _ = myadc.kernel_gs()
    assert abs(e_mp2 - -0.2218560609876961) < 1e-8
    e, u, p, _ = RADCEA(myadc).kernel(nroots=3)
    ref_e = [0.0287675413010661, 0.0553475511361251, 0.1643553780332306]
    ref_p = [1.9868196915945326, 1.9941128865405613, 1.9760420333383126]
    np.testing.assert_allclose(e, ref_e, atol=1e-6)
    np.testing.assert_allclose(p, ref_p, atol=1e-6)
