"""Spinor X2C-1e tests.

X2C-1e is exact for one-electron systems, so the analytic Dirac point-
nucleus spectrum of a hydrogen-like Z=80 ion is the oracle: the 1s_1/2
energy and the 2p_1/2 - 2p_3/2 spin-orbit splitting must emerge from the
pV x p machinery (basis-limited to ~0.3%).
"""
import numpy as np
import pytest
import scipy.linalg

import pyscf_tpu as pt
from pyscf_tpu.lib.parameters import LIGHT_SPEED
from pyscf_tpu.x2c import x2c1e_spinor_hcore


def test_ipnucip_trace():
    from pyscf_tpu.ops.integrals.int1e_deriv import (int1e_ipnucip,
                                                     int1e_pnucp)
    mol = pt.M(atom='O 0 0 0; H 0 0 1.1', basis='sto-3g')
    W = np.asarray(int1e_ipnucip(mol))
    pvp = np.asarray(int1e_pnucp(mol))
    assert abs(W[0, 0] + W[1, 1] + W[2, 2] - pvp).max() < 1e-10
    # <d_d u|V|d_e v> = <d_e v|V|d_d u>: W[d,e] = W[e,d].T
    for d in range(3):
        for e in range(3):
            assert abs(W[d, e] - W[e, d].T).max() < 1e-10


@pytest.mark.slow
def test_spinor_x2c_dirac_oracle():
    Z = 80
    exps_s = [2.0 ** k for k in range(22, -2, -1)]
    exps_p = [2.0 ** k for k in range(20, -2, -1)]
    basis = ([[0, [e, 1.0]] for e in exps_s]
             + [[1, [e, 1.0]] for e in exps_p])
    mol = pt.M(atom='Hg 0 0 0', basis={'Hg': basis}, charge=Z - 1, spin=0)
    h1 = np.asarray(x2c1e_spinor_hcore(mol))
    s = np.asarray(mol.intor('int1e_ovlp'))
    nao = mol.nao
    s2 = np.zeros((2 * nao, 2 * nao), dtype=complex)
    s2[:nao, :nao] = s
    s2[nao:, nao:] = s
    e = scipy.linalg.eigh(h1, s2, eigvals_only=True)

    c = LIGHT_SPEED
    alpha = 1.0 / c

    def dirac(n, kappa):
        g = np.sqrt(kappa ** 2 - (Z * alpha) ** 2)
        return c ** 2 / np.sqrt(
            1 + (Z * alpha / (n - abs(kappa) + g)) ** 2) - c ** 2

    e_1s = dirac(1, -1)
    e_2p12 = dirac(2, 1)
    e_2p32 = dirac(2, -2)
    assert abs(e[0] - e_1s) / abs(e_1s) < 2e-3
    soc = np.mean(e[6:8]) - np.mean(e[4:6])
    assert abs(soc - (e_2p32 - e_2p12)) / (e_2p32 - e_2p12) < 0.05
