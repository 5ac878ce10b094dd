"""k-point dRPA: BZ-sampled correlation equals the Gamma supercell."""
import numpy as np
import pytest

from pyscf_tpu.pbc.gto.cell import Cell
from pyscf_tpu.pbc.scf.khf import KRHF
from pyscf_tpu.pbc.gw import KRPA
from pyscf_tpu.pbc.tools import super_cell

H2_CHAIN = dict(
    atom='H 0 0 0; H 0 0 1.1',
    a=np.diag([6.0, 6.0, 2.2]),
    basis='sto-3g',
    unit='bohr',
    verbose=0,
)


@pytest.mark.slow
def test_krpa_vs_supercell():
    cell = Cell(mesh=[15, 15, 9], **H2_CHAIN).build()
    mf = KRHF(cell, kpts=cell.make_kpts([1, 1, 2]))
    mf.conv_tol = 1e-9
    mf.kernel()
    rpa = KRPA(mf)
    ec_k = rpa.kernel()

    sc = super_cell(cell, [1, 1, 2])
    sc.mesh = [15, 15, 18]
    sc.build()
    mf2 = KRHF(sc)
    mf2.conv_tol = 1e-9
    mf2.kernel()
    ec_sc = KRPA(mf2).kernel()
    assert ec_k < -1e-4                 # nonzero correlation
    assert abs(ec_k - ec_sc / 2) < 3e-6
