"""Dynamic polarizability: the sum-over-states alpha(0) must equal the
static CPHF polarizability (independent linear-response routes)."""
import numpy as np

import pyscf_tpu as pt
from pyscf_tpu.prop.polarizability import (Polarizability,
                                           dynamic_polarizability)


def test_sos_equals_cphf_at_zero():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    mf.kernel()
    a_static = Polarizability(mf).kernel()
    a_dyn = dynamic_polarizability(mf, [0.0, 0.1])
    assert abs(np.asarray(a_static) - a_dyn[0]).max() < 1e-8
    assert np.trace(a_dyn[1]) > np.trace(a_dyn[0])   # normal dispersion
