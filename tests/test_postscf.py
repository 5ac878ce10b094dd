"""MP2 / CCSD / CCSD(T) golden-value tests.

Goldens from the reference's module self-checks (pyscf/mp/mp2.py:942,
pyscf/cc/ccsd.py:1720, pyscf/cc/ccsd_t.py:273), H2O/cc-pVDZ at the
standard test geometry.
"""
import pytest

import pyscf_tpu as pt

ATOM = 'O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587'


@pytest.fixture(scope='module')
def rhf_dz():
    mol = pt.M(atom=ATOM, basis='cc-pvdz', verbose=0)
    mf = mol.RHF()
    mf.init_guess = 'hcore'
    mf.conv_tol = 1e-12
    mf.kernel()
    assert mf.converged
    return mf


@pytest.mark.slow
def test_mp2(rhf_dz):
    emp2, t2 = pt.mp.MP2(rhf_dz).kernel()
    assert abs(emp2 - (-0.204019967288338)) < 1e-8


@pytest.mark.slow
def test_ccsd_and_t(rhf_dz):
    cc = pt.cc.CCSD(rhf_dz)
    cc.verbose = 0
    cc.conv_tol = 1e-10
    cc.conv_tol_normt = 1e-8
    ecc, t1, t2 = cc.kernel()
    assert cc.converged
    assert abs(ecc - (-0.213343234198275)) < 1e-8
    et = cc.ccsd_t()
    assert abs(et - (-0.003060022611584471)) < 1e-8


def test_mp2_h2():
    mol = pt.M(atom='H 0 0 0; H 0 0 0.74', basis='cc-pvdz', verbose=0)
    mf = mol.RHF()
    mf.init_guess = 'hcore'
    mf.conv_tol = 1e-12
    mf.verbose = 0
    mf.kernel()
    emp2, _ = pt.mp.MP2(mf).kernel()
    # H2/cc-pVDZ MP2 correlation ~ -0.0264 Ha
    assert -0.028 < emp2 < -0.025


def test_dfmp2_close_to_mp2(rhf_dz):
    mf2 = rhf_dz.mol.RHF().density_fit()
    mf2.init_guess = 'hcore'
    mf2.conv_tol = 1e-12
    mf2.verbose = 0
    mf2.kernel()
    emp2_df, _ = pt.mp.MP2(mf2).kernel()
    assert abs(emp2_df - (-0.204019967288338)) < 2e-3


def test_fci_h2():
    mol = pt.M(atom='H 0 0 0; H 0 0 0.74', basis='sto-3g', verbose=0)
    mf = mol.RHF()
    mf.init_guess = 'hcore'
    mf.conv_tol = 1e-12
    mf.verbose = 0
    mf.kernel()
    from pyscf_tpu.fci import FCI
    e, c = FCI(mf).kernel()
    # textbook H2/STO-3G FCI at R = 0.74 A
    assert abs(e - (-1.1372838344885023)) < 1e-8


def test_casci_casscf():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g', verbose=0)
    mf = mol.RHF()
    mf.verbose = 0
    mf.conv_tol = 1e-12
    mf.kernel()
    from pyscf_tpu.mcscf import CASCI, CASSCF
    e_casci, _, ci = CASCI(mf, 4, 4).kernel()
    assert e_casci < mf.e_tot          # correlation lowers energy
    mc = CASSCF(mf, 4, 4)
    mc.verbose = 0
    e_casscf, _, _ = mc.kernel()
    assert mc.converged
    assert e_casscf < e_casci - 1e-5   # orbital relaxation lowers further


def test_fci_rdm_energy_consistency():
    """E from (dm1, dm2) must reproduce the FCI eigenvalue."""
    import numpy as np
    from pyscf_tpu.fci import direct_spin1
    rng = np.random.RandomState(3)
    norb, nelec = 4, (2, 2)
    h1 = rng.rand(norb, norb)
    h1 = h1 + h1.T
    eri = rng.rand(norb, norb, norb, norb)
    eri = eri + eri.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)
    e, c = direct_spin1.kernel(h1, eri, norb, nelec)
    dm1, dm2 = direct_spin1.make_rdm12(c, norb, nelec)
    e_rdm = (np.einsum('pq,pq->', h1, dm1)
             + 0.5 * np.einsum('pqrs,pqrs->', eri, dm2))
    assert abs(e_rdm - e) < 1e-9


def test_cisd_between_hf_and_fci():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g', verbose=0)
    mf = mol.RHF()
    mf.verbose = 0
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    mf.kernel()
    from pyscf_tpu.ci import CISD
    ec, _ = CISD(mf).kernel()
    from pyscf_tpu.fci import FCI
    efci, _ = FCI(mf).kernel()
    assert efci - mf.e_tot < ec < 0


def test_gccsd_matches_rccsd():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g', verbose=0)
    mf = mol.RHF()
    mf.verbose = 0
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    mf.kernel()
    from pyscf_tpu.cc.gccsd import GCCSD
    gcc = GCCSD(mf)
    gcc.verbose = 0
    gcc.conv_tol = 1e-10
    gcc.conv_tol_normt = 1e-8
    eg, _, _ = gcc.kernel()
    rcc = pt.cc.CCSD(mf)
    rcc.verbose = 0
    rcc.conv_tol = 1e-10
    rcc.conv_tol_normt = 1e-8
    er, _, _ = rcc.kernel()
    assert abs(eg - er) < 1e-7


@pytest.mark.slow
def test_rpa():
    # reference gw/rpa.py self-check golden
    mol = pt.M(atom='O 0 0 0; H 0 -0.7571 0.5861; H 0 0.7571 0.5861',
               basis='def2-svp', verbose=0)
    mf = pt.dft.RKS(mol, xc='pbe')
    mf.verbose = 0
    mf.conv_tol = 1e-10
    mf.kernel()
    from pyscf_tpu.gw import RPA
    rpa = RPA(mf, auxbasis='def2-svp-ri')
    ec = rpa.kernel()
    assert abs(ec - (-0.307830040357800)) < 1e-6


@pytest.mark.slow
def test_tda_lda_golden():
    """TDA-LDA HF/6-31G vs reference fingerprint golden
    (tdscf/test/test_tdrks.py:150), dense and Davidson paths."""
    import numpy as np
    mol = pt.M(atom='H 0 0 0.917; F 0 0 0', basis='6-31g', verbose=0)
    mf = pt.dft.RKS(mol, xc='lda,vwn')
    mf.grids.prune = None
    mf.conv_tol = 1e-10
    mf.kernel()
    from pyscf_tpu.tdscf.rhf import TDA

    def fp(a):
        a = np.asarray(a).ravel()
        return float(a @ np.cos(np.arange(a.size)))

    es = TDA(mf).kernel(nstates=5) * 27.2114
    assert abs(fp(es) - (-41.201828219760415)) < 5e-5
    td = TDA(mf)
    td.dense_cutoff = 0          # force the Davidson path
    es2 = td.kernel(nstates=5) * 27.2114
    assert abs(fp(es2) - fp(es)) < 1e-7


def test_ccsd_lambda_rdm():
    """CCSD Λ (vjp fixed point) + response RDMs: trace and the exact
    linearity identity E_corr == Σ γ·f + Σ Γ·v."""
    import numpy as np
    import jax.numpy as jnp
    from pyscf_tpu.cc.gccsd import GCCSD
    from pyscf_tpu.cc import gccsd_lambda as gl
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g', verbose=0)
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.kernel()
    cc = GCCSD(mf)
    cc.conv_tol = 1e-10
    cc.conv_tol_normt = 1e-9
    ecc, _, _ = cc.kernel()
    cc.solve_lambda(tol=1e-9)
    assert cc.lambda_converged
    f = jnp.diag(jnp.asarray(cc._mo_e_so))
    g1, g2 = gl.make_rdm12(cc.t1, cc.t2, cc.l1, cc.l2, f, cc._eris_so)
    e_chk = float(jnp.sum(g1 * f) + jnp.sum(g2 * cc._eris_so))
    assert abs(e_chk - ecc) < 1e-9
    dm_ao = cc.make_rdm1(ao_repr=True)
    s = np.asarray(mol.intor('int1e_ovlp'))
    assert abs(np.einsum('ij,ji->', dm_ao, s) - mol.nelectron) < 1e-8


def test_eom_ee_ccsd_h2_exact():
    """EOM-EE-CCSD == FCI for a 2-electron system; the EOM matrix is the
    CC Jacobian obtained by jax.jvp of the amplitude residual."""
    import numpy as np
    from pyscf_tpu.cc.gccsd import GCCSD
    from pyscf_tpu.cc.eom_gccsd import EOMEE
    from pyscf_tpu.fci import direct_spin1
    from pyscf_tpu import ao2mo
    mol = pt.M(atom='H 0 0 0; H 0 0 0.74', basis='sto-3g', verbose=0)
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.kernel()
    cc = GCCSD(mf)
    cc.conv_tol = 1e-12
    cc.conv_tol_normt = 1e-10
    cc.kernel()
    es = EOMEE(cc).kernel(nstates=4)
    h1 = np.asarray(mf.mo_coeff.T @ mf.get_hcore() @ mf.mo_coeff)
    eri_mo = np.asarray(ao2mo.full(mol.intor('int2e'), mf.mo_coeff))
    efci, _ = direct_spin1.kernel(h1, eri_mo, 2, 2, nroots=3)
    ex_fci = np.asarray(efci[1:]) - efci[0]
    # triplet (3x degenerate) + open-shell singlet
    assert abs(es[0] - ex_fci[0]) < 1e-9
    assert abs(es[3] - ex_fci[1]) < 1e-9


def test_cisd_amplitude_vs_determinant():
    """O(N^6) amplitude CISD (CC-Jacobian matvec) == determinant CISD."""
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g', verbose=0)
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.kernel()
    from pyscf_tpu.ci import CISD, CISD_det
    cd = CISD_det(mf)
    cd.kernel()
    ca = CISD(mf)
    ca.kernel()
    assert ca.converged
    assert abs(ca.e_corr - cd.e_corr) < 1e-10


@pytest.mark.slow
def test_g0w0_ac_golden():
    """G0W0-AC(Pade)@PBE HOMO/LUMO vs reference goldens
    (gw/test/test_gw.py:32 test_gwac_pade)."""
    mol = pt.M(atom='O 0 0 0; H 0 -0.7571 0.5861; H 0 0.7571 0.5861',
               basis='def2-svp', verbose=0)
    mf = pt.dft.RKS(mol, xc='pbe')
    mf.conv_tol = 1e-10
    mf.kernel()
    from pyscf_tpu.gw.gw_ac import GWAC
    nocc = mol.nelectron // 2
    gw = GWAC(mf)
    gw.kernel(orbs=range(nocc - 1, nocc + 1))
    assert abs(gw.mo_energy[nocc - 1] - (-0.412849230989)) < 1e-4
    assert abs(gw.mo_energy[nocc] - 0.165745160102) < 1e-4


def test_eom_ip_ea_ccsd_h2_exact():
    """IP/EA-EOM-CCSD via the ghost-orbital embedding of the CC Jacobian:
    exact for 2-electron systems (oracles: 1e H2+ and 3e FCI H2-)."""
    import numpy as np
    import scipy.linalg
    from pyscf_tpu.cc.gccsd import GCCSD
    from pyscf_tpu.cc.eom_gccsd import EOMIP, EOMEA
    from pyscf_tpu.fci import direct_spin1
    from pyscf_tpu import ao2mo
    mol = pt.M(atom='H 0 0 0; H 0 0 0.74', basis='sto-3g', verbose=0)
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.kernel()
    cc = GCCSD(mf)
    cc.conv_tol = 1e-12
    cc.conv_tol_normt = 1e-10
    cc.kernel()
    ip = EOMIP(cc).kernel(nstates=1)
    ea = EOMEA(cc).kernel(nstates=1)
    h = np.asarray(mf.get_hcore())
    s = np.asarray(mf.get_ovlp())
    e_h2p = scipy.linalg.eigh(h, s, eigvals_only=True)[0] + mol.energy_nuc()
    assert abs(ip[0] - (e_h2p - cc.e_tot)) < 1e-10
    h1 = np.asarray(mf.mo_coeff.T @ mf.get_hcore() @ mf.mo_coeff)
    eri_mo = np.asarray(ao2mo.full(mol.intor('int2e'), mf.mo_coeff))
    e_anion, _ = direct_spin1.kernel(h1, eri_mo, 2, (2, 1))
    assert abs(ea[0] - (e_anion + mol.energy_nuc() - cc.e_tot)) < 1e-10
