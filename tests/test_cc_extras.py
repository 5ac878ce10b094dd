"""QCISD, spin-orbital (T), GMP2, FNO tests.

Oracles: QCISD is exact for two-electron systems (Pople 1987); the
spin-orbital (T) must reproduce the spatial RCCSD(T) for closed shells;
GMP2 must reproduce RMP2 (closed shell) and UMP2 (open shell). Golden
CH4/cc-pVDZ QCISD value from reference cc/test/test_qcisd.py:62 runs in
the slow tier.
"""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu import fci
from pyscf_tpu.cc.ccsd import CCSD
from pyscf_tpu.cc.gccsd import GCCSD
from pyscf_tpu.cc.gccsd_t import kernel as gccsd_t_kernel
from pyscf_tpu.cc.qcisd import QCISD
from pyscf_tpu.mp.gmp2 import GMP2
from pyscf_tpu.mp.mp2 import MP2
from pyscf_tpu.scf.ghf import GHF


@pytest.fixture(scope='module')
def h2o_sto3g():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.init_guess = 'hcore'
    mf.kernel()
    return mol, mf


def test_qcisd_two_electron_exact():
    mol = pt.M(atom='H 0 0 0; H 0 0 0.74', basis='cc-pvdz')
    mf = mol.RHF()
    mf.init_guess = 'hcore'
    mf.kernel()
    qc = QCISD(mf)
    qc.kernel()
    assert qc.converged
    efci, _ = fci.FCI(mf).kernel()
    assert abs(qc.e_tot - efci) < 1e-7


def test_gmp2_vs_rmp2(h2o_sto3g):
    mol, mf = h2o_sto3g
    mp = MP2(mf)
    mp.kernel()
    gmf = GHF(mol)
    gmf.init_guess = 'hcore'
    gmf.kernel()
    assert abs(float(gmf.e_tot) - float(mf.e_tot)) < 1e-8
    gmp = GMP2(gmf)
    ecg, _ = gmp.kernel()
    assert abs(ecg - mp.e_corr) < 1e-8


def test_gmp2_vs_ump2_open_shell():
    from pyscf_tpu.mp.ump2 import UMP2
    from pyscf_tpu.scf.uhf import UHF
    mol = pt.M(atom='O 0 0 0; H 0 0 0.97', basis='sto-3g', spin=1)
    umf = UHF(mol)
    umf.kernel()
    ump = UMP2(umf)
    ump.kernel()
    gmf = GHF(mol)
    gmf.kernel()
    gmp = GMP2(gmf)
    ecg, _ = gmp.kernel()
    assert abs(float(gmf.e_tot) - float(umf.e_tot)) < 1e-7
    assert abs(ecg - ump.e_corr) < 1e-7


def test_gccsd_t_vs_rccsd_t(h2o_sto3g):
    mol, mf = h2o_sto3g
    rcc = CCSD(mf)
    rcc.kernel()
    et_r = rcc.ccsd_t()
    gcc = GCCSD(mf)
    gcc.kernel()
    assert abs(gcc.e_corr - rcc.e_corr) < 1e-7
    et_g = gccsd_t_kernel(gcc._eris_so, gcc._mo_e_so, gcc._nocc_so,
                          gcc.t1, gcc.t2)
    assert abs(et_g - et_r) < 1e-8


def test_mp2_fno(h2o_sto3g):
    mol, mf = h2o_sto3g
    mp = MP2(mf)
    mp.kernel()
    nvir_act, no_coeff = mp.make_fno(thresh=1e-10)
    # keeping every NO reproduces full MP2 (orbital-rotation invariance
    # of the virtual space)
    nocc = mol.nelectron // 2
    s = np.asarray(mol.intor('int1e_ovlp'))
    assert abs(no_coeff.T @ s @ no_coeff - np.eye(mol.nao)).max() < 1e-8


@pytest.mark.slow
def test_qcisd_ch4_golden():
    """Reference cc/test/test_qcisd.py:62: CH4/cc-pVDZ frozen=1
    QCISD e_tot = -40.3839884."""
    mol = pt.M(atom="""C  0.000  0.000  0.000
                       H  0.637  0.637  0.637
                       H -0.637 -0.637  0.637
                       H -0.637  0.637 -0.637
                       H  0.637 -0.637 -0.637""", basis='cc-pvdz')
    mf = mol.RHF()
    mf.init_guess = 'hcore'
    mf.kernel()
    qc = QCISD(mf, frozen=1)
    qc.kernel()
    assert qc.converged
    assert abs(qc.e_tot - -40.3839884) < 1e-6
@pytest.mark.slow
def test_qcisd_t_ne_golden():
    """Reference cc/test/test_qcisd.py:79: Ne/cc-pVDZ frozen=1
    QCISD(T) e_tot = -128.6788843055109."""
    mol = pt.M(atom="Ne 0 0 0", basis="cc-pvdz")
    mf = mol.RHF()
    mf.init_guess = "hcore"
    mf.kernel()
    qc = QCISD(mf, frozen=1)
    qc.kernel()
    et = qc.qcisd_t()
    assert abs(qc.e_tot + et - -128.6788843055109) < 1e-6


@pytest.mark.slow
def test_bccd():
    """Brueckner CC: singles vanish, energy close to CCSD (reference
    cc/test/test_addons.py test_bccd_kernel_ asserts the same)."""
    from pyscf_tpu.cc.bccd import bccd_kernel_
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='6-31g')
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    mf.kernel()
    gcc = GCCSD(mf)
    gcc.kernel()
    e_ccsd = float(gcc.e_tot)
    e_bccd, normt1, mo = bccd_kernel_(gcc, max_cycle=25)
    assert normt1 < 1e-4
    assert abs(e_bccd - e_ccsd) < 0.005


def test_ccsd_t_phase_invariance():
    """E(T) must be invariant under per-orbital complex phase rotations
    (pins the conjugation placement of the complex triples formula)."""
    import jax.numpy as jnp
    from pyscf_tpu.cc import gccsd_t
    from pyscf_tpu.cc.gccsd import (_gccsd_energy, _gccsd_update,
                                    _spin_orbital_eris)
    from pyscf_tpu.lib.diis import DIIS
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    mf.kernel()
    eris0, mo_e, nocc, spins, orbs = _spin_orbital_eris(mf)
    eris0 = np.asarray(eris0)
    mo_e = np.asarray(mo_e)
    nso = len(mo_e)

    def run_cc(eris):
        eris = jnp.asarray(eris)
        o = slice(0, nocc)
        v = slice(nocc, None)
        eia = jnp.asarray(mo_e[:nocc, None] - mo_e[None, nocc:])
        eijab = eia[:, None, :, None] + eia[None, :, None, :]
        oovv = eris[o, o, v, v]
        t2 = jnp.conj(oovv) / eijab
        t1 = jnp.zeros((nocc, nso - nocc), dtype=eris.dtype)
        diis = DIIS(6)
        e_last = 0.0
        for it in range(80):
            t1n, t2n = _gccsd_update(t1, t2, eris, jnp.asarray(mo_e),
                                     jnp.asarray(nocc))
            normt = float(jnp.linalg.norm(t1n - t1)
                          + jnp.linalg.norm(t2n - t2))
            t1, t2 = diis.update((t1n, t2n), (t1n - t1, t2n - t2))
            ec = float(_gccsd_energy(t1, t2, oovv).real)
            if abs(ec - e_last) < 1e-10 and normt < 1e-8:
                break
            e_last = ec
        return ec, gccsd_t.kernel(np.asarray(eris), mo_e, nocc, t1, t2)

    ec0, et0 = run_cc(eris0)
    rng = np.random.RandomState(3)
    ph = np.exp(1j * rng.rand(nso) * 2 * np.pi)
    erisc = eris0 * np.einsum('p,q,r,s->pqrs', ph.conj(), ph.conj(), ph, ph)
    ec1, et1 = run_cc(erisc)
    assert abs(ec1 - ec0) < 1e-10
    assert abs(et1 - et0) < 1e-12


def test_spinor_gccsd_path():
    """convert_to_ghf + the spinor ERI branch reproduce the spatial-pair
    GCCSD exactly; a native GHF SCF object agrees to SCF precision."""
    from pyscf_tpu.scf.addons import convert_to_ghf
    from pyscf_tpu.scf.uhf import UHF
    mol = pt.M(atom='O 0 0 0; H 0 0 0.97', basis='sto-3g', spin=1)
    umf = UHF(mol)
    umf.conv_tol = 1e-11
    umf.kernel()
    gcc_u = GCCSD(umf)
    gcc_u.kernel()
    gmf = convert_to_ghf(umf)
    gcc_g = GCCSD(gmf)
    gcc_g.kernel()
    assert abs(gcc_g.e_corr - gcc_u.e_corr) < 1e-9


def test_ccsd_chkfile_resume(tmp_path):
    """Per-cycle amplitude checkpoint + resume reaches the converged
    answer (reference cc/ccsd.py restore_from_diis_ analog)."""
    from pyscf_tpu.cc.ccsd import CCSD
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    mf.kernel()
    fn = str(tmp_path / 'cc.chk')
    cc1 = CCSD(mf)
    cc1.chkfile = fn
    cc1.max_cycle = 5
    cc1.kernel()
    assert not cc1.converged
    cc2 = CCSD(mf)
    cc2.chkfile = fn
    ec, t1, t2 = cc2.restore_from_chk_()
    assert cc2.converged
    cc3 = CCSD(mf)
    cc3.kernel()
    assert abs(ec - cc3.e_corr) < 1e-7


def test_ccsd_ovvv_free_matches_standard():
    """The ovvv-free DF update (update_amps_dfb) must match the standard
    DF-CCSD to machine precision (same equations, reassociated)."""
    import pyscf_tpu as pt
    from pyscf_tpu.cc import ccsd as ccmod
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g', verbose=0)
    mf = mol.RHF().density_fit()
    mf.conv_tol = 1e-12
    mf.kernel()
    cc1 = mf.CCSD()
    cc1.conv_tol = 1e-10
    cc1.kernel()
    old = ccmod.OVVV_MAX_ELEMS
    try:
        ccmod.OVVV_MAX_ELEMS = 1          # force the ovvv-free path
        cc2 = mf.CCSD()
        cc2.conv_tol = 1e-10
        cc2.kernel()
    finally:
        ccmod.OVVV_MAX_ELEMS = old
    assert cc2._eris.ovvv is None
    assert abs(float(cc1.e_corr) - float(cc2.e_corr)) < 1e-10
