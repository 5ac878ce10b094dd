"""BSE@GW and evGW tests.

Goldens: reference gw/test/test_bse.py — H2O/def2-SVP PBE BSE@G0W0
lowest singlet 0.25749397, triplet 0.22299263 (tolerance reflects the
Pade/quadrature differences feeding through the GW QP energies).
"""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.gw.bse import BSE
from pyscf_tpu.gw.evgw import evGW
from pyscf_tpu.gw.gw_ac import GWAC


@pytest.mark.slow
def test_bse_goldens():
    mol = pt.M(atom=[['O', (0.0, 0.0, 0.0)], ['H', (0.7571, 0.0, 0.5861)],
                     ['H', (-0.7571, 0.0, 0.5861)]], basis='def2-svp')
    mf = pt.dft.RKS(mol, xc='pbe,pbe')
    mf.conv_tol = 1e-10
    mf.kernel()
    gw = GWAC(mf)
    gw.kernel()
    bse = BSE(gw)
    es, _ = bse.kernel('s')
    et, _ = bse.kernel('t')
    assert abs(es[0] - 0.25749397) < 5e-4
    assert abs(et[0] - 0.22299263) < 5e-4
    assert et[0] < es[0]                  # Hund ordering


@pytest.mark.slow
def test_evgw():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = pt.dft.RKS(mol, xc='pbe,pbe')
    mf.conv_tol = 1e-10
    mf.kernel()
    e0 = GWAC(mf).kernel()
    ev = evGW(mf)
    eev = ev.kernel()
    ih = mol.nelectron // 2 - 1
    assert ev.ev_converged
    # self-consistency moves the HOMO by a finite, bounded amount
    assert 1e-4 < abs(eev[ih] - e0[ih]) < 0.1
