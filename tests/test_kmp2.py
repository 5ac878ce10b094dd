"""k-point MP2 tests.

Oracles: (1) at Gamma, sum_ij (ij|ji) from the FFT MO-ERI block must
equal tr(dm.K)/2 from the independently-validated KFFTDF exchange build;
(2) a 2x1x1 k-mesh KMP2 must equal the doubled-supercell Gamma KMP2 per
cell (the reference's own BZ-sampling consistency strategy).
"""
import numpy as np
import pytest

from pyscf_tpu.pbc.gto import Cell
from pyscf_tpu.pbc.mp.kmp2 import KMP2, eri_block
from pyscf_tpu.pbc.scf.khf import KRHF

DIAMOND = dict(
    atom='C 0 0 0; C 0.8917 0.8917 0.8917',
    a=[[0, 1.7834, 1.7834], [1.7834, 0, 1.7834], [1.7834, 1.7834, 0]],
    basis='gth-szv', pseudo='gth-pade', verbose=0)


def test_eri_block_normalization():
    cell = Cell(mesh=[11] * 3, **DIAMOND).build()
    kpts = cell.make_kpts([1, 1, 1])
    mf = KRHF(cell, kpts=kpts)
    mf.conv_tol = 1e-9
    mf.kernel()
    dm = mf.make_rdm1()
    _, vk = mf.with_df.get_jk_kpts(dm, with_j=False, with_k=True)
    ek_jk = np.einsum('ij,ji->', vk[0], dm[0]).real
    occ = np.asarray(mf.mo_occ[0]) > 0
    co = np.asarray(mf.mo_coeff[0])[:, occ]
    ao_k = mf.with_df._ao_on_grid_kpts()
    g = eri_block(cell, ao_k, kpts, co, 0, co, 0, co, 0, co, 0)
    ek_blk = 4.0 * np.einsum('ijji->', g).real
    assert abs(ek_jk - ek_blk) < 1e-8 * max(1.0, abs(ek_jk))
    mp = KMP2(mf)
    ec, _ = mp.kernel()
    assert ec < 0


@pytest.mark.slow
def test_kmp2_vs_supercell():
    from pyscf_tpu.pbc.tools import super_cell
    cell = Cell(mesh=[11] * 3, **DIAMOND).build()
    kpts = cell.make_kpts([2, 1, 1])
    mf = KRHF(cell, kpts=kpts)
    mf.conv_tol = 1e-9
    mf.kernel()
    eck, _ = KMP2(mf).kernel()
    sc = super_cell(cell, [2, 1, 1])
    sc.mesh = [22, 11, 11]
    mfs = KRHF(sc, kpts=sc.make_kpts([1, 1, 1]))
    mfs.conv_tol = 1e-9
    mfs.kernel()
    ecs, _ = KMP2(mfs).kernel()
    assert abs(eck - ecs / 2) < 1e-7
