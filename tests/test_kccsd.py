"""k-point CCSD tests.

Oracles: the MP2 energy evaluated from the Bloch spin-orbital ERIs must
equal the independently-validated KMP2; the 2x1x1 k-mesh KCCSD must
equal the doubled-supercell Gamma KCCSD per cell (this is sensitive to
every complex-conjugation convention in the CC equations).
"""
import numpy as np
import pytest

from pyscf_tpu.pbc.cc import KRCCSD
from pyscf_tpu.pbc.gto import Cell
from pyscf_tpu.pbc.mp.kmp2 import KMP2
from pyscf_tpu.pbc.scf.khf import KRHF

DIAMOND = dict(
    atom='C 0 0 0; C 0.8917 0.8917 0.8917',
    a=[[0, 1.7834, 1.7834], [1.7834, 0, 1.7834], [1.7834, 1.7834, 0]],
    basis='gth-szv', pseudo='gth-pade', verbose=0)


@pytest.mark.slow
def test_kccsd_gamma_mp2_consistency():
    cell = Cell(mesh=[11] * 3, **DIAMOND).build()
    mf = KRHF(cell, kpts=cell.make_kpts([1, 1, 1]))
    mf.conv_tol = 1e-9
    mf.kernel()
    ec_mp, _ = KMP2(mf).kernel()
    cc = KRCCSD(mf)
    ec, _, _ = cc.kernel()
    assert abs(cc.emp2 - ec_mp) < 1e-10
    assert cc.converged
    assert ec < 0


@pytest.mark.slow
def test_kccsd_vs_supercell():
    from pyscf_tpu.pbc.tools import super_cell
    cell = Cell(mesh=[11] * 3, **DIAMOND).build()
    mf = KRHF(cell, kpts=cell.make_kpts([2, 1, 1]))
    mf.conv_tol = 1e-9
    mf.kernel()
    cc = KRCCSD(mf)
    eck, _, _ = cc.kernel()
    sc = super_cell(cell, [2, 1, 1])
    sc.mesh = [22, 11, 11]
    mfs = KRHF(sc, kpts=sc.make_kpts([1, 1, 1]))
    mfs.conv_tol = 1e-9
    mfs.kernel()
    ccs = KRCCSD(mfs)
    ecs, _, _ = ccs.kernel()
    assert abs(eck - ecs / 2) < 1e-6


@pytest.mark.slow
def test_kccsd_t_vs_supercell():
    from pyscf_tpu.pbc.tools import super_cell
    cell = Cell(mesh=[11] * 3, **DIAMOND).build()
    mf = KRHF(cell, kpts=cell.make_kpts([2, 1, 1]))
    mf.conv_tol = 1e-9
    mf.kernel()
    cc = KRCCSD(mf)
    cc.kernel()
    et_k = cc.ccsd_t()
    sc = super_cell(cell, [2, 1, 1])
    sc.mesh = [22, 11, 11]
    mfs = KRHF(sc, kpts=sc.make_kpts([1, 1, 1]))
    mfs.conv_tol = 1e-9
    mfs.kernel()
    ccs = KRCCSD(mfs)
    ccs.kernel()
    et_s = ccs.ccsd_t()
    assert abs(et_k - et_s / 2) < 1e-7
