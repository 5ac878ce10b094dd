"""k-point TDA: BZ-sampled spectrum equals the Gamma supercell spectrum."""
import numpy as np
import pytest

from pyscf_tpu.pbc.gto.cell import Cell
from pyscf_tpu.pbc.scf.khf import KRHF
from pyscf_tpu.pbc.tdscf import KTDA
from pyscf_tpu.pbc.tools import super_cell

H2_CHAIN = dict(
    atom='H 0 0 0; H 0 0 1.1',
    a=np.diag([6.0, 6.0, 2.2]),
    basis='sto-3g',
    unit='bohr',
    verbose=0,
)


@pytest.mark.slow
def test_ktda_vs_supercell():
    cell = Cell(mesh=[15, 15, 9], **H2_CHAIN).build()
    kpts = cell.make_kpts([1, 1, 2])
    mf = KRHF(cell, kpts=kpts)
    mf.conv_tol = 1e-9
    mf.kernel()
    assert mf.converged
    td = KTDA(mf)
    e_k = td.kernel(nstates=3)

    sc = super_cell(cell, [1, 1, 2])
    sc.mesh = [15, 15, 18]
    sc.build()
    mf2 = KRHF(sc)          # Gamma only
    mf2.conv_tol = 1e-9
    mf2.kernel()
    assert abs(mf2.e_tot / 2 - mf.e_tot) < 1e-6
    td2 = KTDA(mf2)
    e_sc = td2.kernel(nstates=3)
    assert abs(e_k[0] - e_sc[0]) < 1e-5


def test_ktda_gamma_smoke():
    cell = Cell(mesh=[11, 11, 7], **H2_CHAIN).build()
    mf = KRHF(cell)
    mf.conv_tol = 1e-8
    mf.kernel()
    td = KTDA(mf)
    # H2/STO-3G at Gamma has a single occ x vir transition; requesting
    # more states clamps to the space dimension
    e = td.kernel(nstates=2)
    assert len(e) == 1
    assert (np.asarray(e) > 0).all()
