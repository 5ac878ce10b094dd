"""MP2 variant tests (SCS/SOS)."""
import pyscf_tpu as pt




def test_scs_mp2():
    """energy_scs(1,1) must equal plain MP2; SCS/SOS give distinct
    negative correlation energies."""
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.init_guess = 'hcore'
    mf.conv_tol = 1e-12
    mf.kernel()
    from pyscf_tpu.mp.mp2 import MP2
    mp = MP2(mf)
    mp.kernel()
    assert abs(mp.energy_scs(1.0, 1.0) - mp.e_corr) < 1e-10
    e_scs = mp.energy_scs()
    e_sos = mp.energy_scs(1.3, 0.0)
    assert e_scs < 0 and e_sos < 0
    assert abs(e_scs - mp.e_corr) > 1e-4


def test_scs_ump2_matches_rmp2_closed_shell():
    """Closed-shell UMP2 os/ss split must reproduce the RMP2 split."""
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    mf.kernel()
    mfu = mol.UHF()
    mfu.conv_tol = 1e-12
    mfu.init_guess = 'hcore'
    mfu.kernel()
    from pyscf_tpu.mp import UMP2
    from pyscf_tpu.mp.mp2 import MP2
    mp = MP2(mf)
    mp.kernel()
    ump = UMP2(mfu)
    ump.kernel()
    assert abs(ump.e_corr_os + ump.e_corr_ss - ump.e_corr) < 1e-12
    assert abs(ump.energy_scs() - mp.energy_scs()) < 1e-8
