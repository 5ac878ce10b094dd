"""State-average CASSCF and AVAS active-space selection tests."""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.mcscf import CASCI, CASSCF, avas, state_average_


@pytest.fixture(scope='module')
def h2o():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.init_guess = 'hcore'
    mf.kernel()
    return mol, mf


def test_avas(h2o):
    mol, mf = h2o
    ncas, nelecas, mo = avas(mf, ['O 2p', 'H 1s'])
    assert ncas == 6 and nelecas == (4, 4)
    s = np.asarray(mol.intor('int1e_ovlp'))
    assert abs(mo.T @ s @ mo - np.eye(mol.nao)).max() < 1e-8
    mc = CASCI(mf, ncas, nelecas)
    e, _, _ = mc.kernel(mo_coeff=np.asarray(mo))
    assert e < float(mf.e_tot) - 1e-6


def test_state_average_casscf(h2o):
    mol, mf = h2o
    mc = CASSCF(mf, 4, 4)
    state_average_(mc, (0.5, 0.5))
    e_avg, _, ci = mc.kernel()
    assert len(ci) == 2
    assert mc.e_states[0] < mc.e_states[1]
    assert abs(e_avg - 0.5 * (mc.e_states[0] + mc.e_states[1])) < 1e-9
    # the SA ground state lies above the state-specific optimum
    mc_ss = CASSCF(mf, 4, 4)
    e_gs, _, _ = mc_ss.kernel()
    assert mc.e_states[0] > e_gs - 1e-6


def test_dmet_cas(h2o):
    from pyscf_tpu.mcscf.dmet_cas import guess_cas
    mol, mf = h2o
    ncas, nelecas, mo = guess_cas(mf, ['O 2p', 'H 1s'])
    s = np.asarray(mol.intor('int1e_ovlp'))
    assert abs(mo.T @ s @ mo - np.eye(mol.nao)).max() < 1e-8
    mc = CASCI(mf, ncas, nelecas)
    e, _, _ = mc.kernel(mo_coeff=np.asarray(mo))
    assert e < float(mf.e_tot) - 1e-6


def test_casscf_chkfile_resume(h2o, tmp_path):
    mol, mf = h2o
    fn = str(tmp_path / 'mc.chk')
    mc1 = CASSCF(mf, 4, 4)
    mc1.chkfile = fn
    mc1.max_cycle_macro = 2
    mc1.kernel()
    assert not mc1.converged
    mc2 = CASSCF(mf, 4, 4)
    mc2.chkfile = fn
    e2, _, _ = mc2.restore_from_chk_()
    assert mc2.converged
    mc3 = CASSCF(mf, 4, 4)
    e3, _, _ = mc3.kernel()
    assert abs(e2 - e3) < 1e-7


def test_cas_natorb():
    """Natural-orbital rotation leaves the CASCI energy invariant and
    diagonalizes the active 1-RDM."""
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    mf.kernel()
    from pyscf_tpu.mcscf import CASCI
    mc = CASCI(mf, 4, 4)
    e0, _, _ = mc.kernel()
    mo_n, ci_n, occ = mc.cas_natorb()
    assert abs(occ.sum() - 4.0) < 1e-9
    mc2 = CASCI(mf, 4, 4)
    e1, _, _ = mc2.kernel(mo_coeff=mo_n)
    assert abs(e1 - e0) < 1e-9
    dm = np.asarray(mc2.fcisolver.make_rdm1(ci_n, 4, mc2.nelecas))
    assert abs(dm - np.diag(np.diag(dm))).max() < 1e-7
