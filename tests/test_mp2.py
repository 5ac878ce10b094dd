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
