"""UHF analysis-method tests."""
import pyscf_tpu as pt




def test_uhf_analysis_methods():
    """UHF dipole/Mulliken must handle the stacked spin density; spin
    populations sum to 2S and vanish for a closed shell."""
    import numpy as np
    mol = pt.M(atom='O 0 0 0; H 0 0 0.97', basis='sto-3g', spin=1)
    mf = mol.UHF()
    mf.conv_tol = 1e-11
    mf.kernel()
    _, chg = mf.mulliken_pop()
    _, spin = mf.mulliken_spin_pop()
    assert abs(chg.sum()) < 1e-8
    assert abs(spin.sum() - 1.0) < 1e-8
    m2 = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
              basis='sto-3g')
    r = m2.RHF()
    r.conv_tol = 1e-12
    r.init_guess = 'hcore'
    r.kernel()
    u = m2.UHF()
    u.conv_tol = 1e-12
    u.init_guess = 'hcore'
    u.kernel()
    assert abs(np.asarray(r.dip_moment())
               - np.asarray(u.dip_moment())).max() < 1e-6
    assert abs(u.mulliken_spin_pop()[1]).max() < 1e-6
