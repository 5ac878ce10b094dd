"""Electron-phonon coupling tests.

Reference goldens from eph/test/test_rhf.py:48-50: fingerprints of the
harmonic frequencies and of |g| (coupling-matrix magnitudes). The
reference fingerprint is taken in pyscf's AO ordering (p shells as
x,y,z); this codebase orders spherical AOs m=-l..l (p as y,z,x), so the
comparison permutes p blocks first.
"""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.eph import EPH


def fp(a):
    a = np.asarray(a).ravel()
    return float(np.dot(np.cos(np.arange(a.size)), a))


def perm_to_pyscf_ao_order(mol):
    perm = np.arange(mol.nao)
    for ish, sh in enumerate(mol._shells):
        if sh.l == 1:
            o = mol.ao_loc[ish]
            perm[o:o + 3] = [o + 2, o + 0, o + 1]
    return perm


@pytest.mark.slow
def test_eph_h2o():
    mol = pt.M(atom=[['O', (0.0, -0.000000000775, 0.923671924285)],
                     ['H', (0.0, -1.432564848017, 2.125164039823)],
                     ['H', (0.0, 1.432564848792, 2.125164035930)]],
               unit='bohr', basis='sto-3g')
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    mf.kernel()
    eph = EPH(mf)
    mat, freq = eph.kernel()
    # reference eph/test/test_rhf.py:50 fingerprint of the frequencies
    assert abs(fp(freq) - 0.026085354876839845) < 1e-7
    assert mat.shape[0] == 3
    # each coupling matrix is symmetric (dV is a symmetric operator)
    for g in mat:
        assert abs(g - g.T).max() < 1e-6
    # reference eph/test/test_rhf.py:48 fingerprint of |g| (analytic
    # golden; the reference's own FD agrees with it to ~1e-5)
    p = perm_to_pyscf_ao_order(mol)
    assert abs(fp(np.abs(mat[:, p][:, :, p]))
               - (-0.14873539046411535)) < 1e-5
