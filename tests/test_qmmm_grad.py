"""QM/MM gradient test: analytic forces on MM charges vs central
differences of the QM/MM SCF energy."""
import numpy as np

import pyscf_tpu as pt
from pyscf_tpu.lib.parameters import BOHR
from pyscf_tpu.qmmm import add_mm_charges, mm_gradient

COORDS_MM = np.array([[2.5, 0.4, -0.3], [-2.0, 1.0, 0.5]])
CHARGES_MM = np.array([0.35, -0.35])


def _run(cmm):
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    add_mm_charges(mf, cmm, CHARGES_MM)
    return mf.kernel(), mf


def test_mm_gradient_fd():
    e0, mf0 = _run(COORDS_MM)
    g = mm_gradient(mf0, COORDS_MM, CHARGES_MM)
    step = 1e-4
    fd = np.zeros_like(g)
    for k in range(2):
        for x in range(3):
            cp = COORDS_MM.copy()
            cp[k, x] += step
            cm = COORDS_MM.copy()
            cm[k, x] -= step
            fd[k, x] = (_run(cp)[0] - _run(cm)[0]) / (2 * step / BOHR)
    assert abs(g - fd).max() < 1e-7
