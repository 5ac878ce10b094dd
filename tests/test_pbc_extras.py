"""KUHF, AFTDF/ft_ao, and CHGCAR tests."""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.pbc.gto import Cell

DIAMOND = dict(
    atom='C 0 0 0; C 0.8917 0.8917 0.8917',
    a=[[0, 1.7834, 1.7834], [1.7834, 0, 1.7834], [1.7834, 1.7834, 0]],
    basis='gth-szv', pseudo='gth-pade', verbose=0)


def test_ft_aopair_identities():
    """F(0) = overlap and dF/dG|_0 = -i <u|r|v> (analytic oracles)."""
    from pyscf_tpu.ops.integrals.ft_ao import ft_aopair
    from pyscf_tpu.ops.integrals.int1e import int1e_r
    mol = pt.M(atom='O 0 0 0; H 0 0 1.1', basis='cc-pvdz')
    F0 = np.asarray(ft_aopair(mol, np.zeros((1, 3))))[0]
    S = np.asarray(mol.intor('int1e_ovlp'))
    assert abs(F0 - S).max() < 1e-12
    r = np.asarray(int1e_r(mol))
    eps = 1e-5
    for d in range(3):
        Gp = np.zeros((1, 3))
        Gp[0, d] = eps
        Gm = -Gp
        dF = (np.asarray(ft_aopair(mol, Gp))[0]
              - np.asarray(ft_aopair(mol, Gm))[0]) / (2 * eps)
        assert abs(dF - (-1j) * r[d]).max() < 1e-6


@pytest.mark.slow
def test_aftdf_vs_fftdf():
    from pyscf_tpu.pbc.df.aft import AFTDF
    from pyscf_tpu.pbc.df.fft import FFTDF
    rng = np.random.RandomState(0)
    diffs = []
    for n in (9, 11):
        cell = Cell(mesh=[n] * 3, **DIAMOND).build()
        c = rng.rand(cell.nao, 4)
        dm = 2.0 * c @ c.T / 10
        vj_f, vk_f = FFTDF(cell).get_jk(dm)
        vj_a, vk_a = AFTDF(cell).get_jk(dm)
        diffs.append(max(abs(np.asarray(vj_f) - vj_a).max(),
                         abs(np.asarray(vk_f) - vk_a).max()))
    # both discretizations converge to each other with the mesh
    # (measured: 2.9e-4 at mesh 9 -> 3.0e-5 at 11 -> 4.1e-6 at 13)
    assert diffs[1] < 0.3 * diffs[0]
    assert diffs[1] < 1e-4


@pytest.mark.slow
def test_kuhf_vs_krhf():
    from pyscf_tpu.pbc.scf.khf import KRHF
    from pyscf_tpu.pbc.scf.kuhf import KUHF
    cell = Cell(mesh=[11] * 3, **DIAMOND).build()
    kpts = cell.make_kpts([2, 1, 1])
    mfr = KRHF(cell, kpts=kpts)
    mfr.conv_tol = 1e-9
    er = mfr.kernel()
    mfu = KUHF(cell, kpts=kpts)
    mfu.conv_tol = 1e-9
    eu = mfu.kernel()
    assert abs(er - eu) < 1e-7


def test_chgcar(tmp_path):
    from pyscf_tpu.tools import chgcar
    cell = Cell(mesh=[7] * 3, **DIAMOND).build()
    rng = np.random.RandomState(1)
    c = rng.rand(cell.nao, 4)
    dm = 2.0 * c @ c.T / 10
    fn = str(tmp_path / 'CHGCAR')
    rho = chgcar.density(cell, dm, fn)
    txt = open(fn).read().splitlines()
    assert txt[5].split() == ['C']
    assert txt[6].split() == ['2']
    assert 'Direct' in txt[7]
    assert (rho >= -1e-10).all()


@pytest.mark.slow
def test_sharded_kmp2():
    """k-triples over the 8-virtual-device mesh == serial KMP2."""
    from pyscf_tpu.pbc.mp.kmp2 import KMP2
    from pyscf_tpu.pbc.mp.kmp2_sharded import kernel_sharded
    from pyscf_tpu.pbc.scf.khf import KRHF
    cell = Cell(mesh=[11] * 3, **DIAMOND).build()
    mf = KRHF(cell, kpts=cell.make_kpts([2, 1, 1]))
    mf.conv_tol = 1e-9
    mf.kernel()
    ec_serial, _ = KMP2(mf).kernel()
    ec_shard = kernel_sharded(mf)
    assert abs(ec_serial - ec_shard) < 1e-9


@pytest.mark.slow
def test_kuks_vs_krks():
    """Closed-shell KUKS == KRKS (spin-resolved XC consistency)."""
    from pyscf_tpu.pbc.dft.krks import KRKS
    from pyscf_tpu.pbc.dft.kuks import KUKS
    cell = Cell(mesh=[11] * 3, **DIAMOND).build()
    kpts = cell.make_kpts([2, 1, 1])
    mfr = KRKS(cell, kpts=kpts, xc='lda,vwn')
    mfr.conv_tol = 1e-9
    er = mfr.kernel()
    mfu = KUKS(cell, kpts=kpts, xc='lda,vwn')
    mfu.conv_tol = 1e-9
    eu = mfu.kernel()
    assert abs(er - eu) < 1e-8
