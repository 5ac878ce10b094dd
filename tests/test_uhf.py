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


def test_mom_delta_scf():
    """MOM keeps a HOMO->LUMO hole from collapsing: the delta-SCF state
    converges above the ground state with the ground HOMO vacated."""
    import numpy as np
    from pyscf_tpu.scf.addons import mom_occ_
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.UHF()
    mf.conv_tol = 1e-11
    mf.init_guess = 'hcore'
    e0 = float(mf.kernel())
    mo = np.asarray(mf.mo_coeff)
    occ = np.asarray(mf.mo_occ).copy()
    na = int(occ[0].sum())
    occ[0, na - 1] = 0.0
    occ[0, na] = 1.0
    mf2 = mol.UHF()
    mf2.conv_tol = 1e-10
    mom_occ_(mf2, mo, occ)
    dm0 = np.stack([mo[s][:, occ[s] > 0] @ mo[s][:, occ[s] > 0].T
                    for s in range(2)])
    e1 = float(mf2.kernel(dm0=dm0))
    assert mf2.converged
    assert e1 > e0 + 0.05
    s1e = np.asarray(mf2.get_ovlp())
    ca = np.asarray(mf2.mo_coeff)[0][:, np.asarray(mf2.mo_occ)[0] > 0]
    assert np.sum((mo[0][:, na - 1] @ s1e @ ca) ** 2) < 0.1
