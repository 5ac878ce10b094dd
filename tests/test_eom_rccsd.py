"""EOM-RCCSD excitation energies vs reference golden values.

Goldens: H2O/cc-pVDZ RHF -> RCCSD roots hard-coded in the reference's
pyscf/cc/test/test_eom_rccsd.py:107-230 (IP 0.43356043/0.51876599/
0.67828760, EA 0.16737886/0.24027614, lowest EE singlet 0.30057167).
Also cross-checks the spatial-orbital EOM (Jacobian-jvp construction,
pyscf_tpu/cc/eom_rccsd.py) against the spin-orbital eom_gccsd sigma
implementation on the same system.
"""
import numpy as np
import pytest

import pyscf_tpu as pt

ATOM = 'O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587'


@pytest.fixture(scope='module')
def h2o_ccsd():
    mol = pt.M(atom=ATOM, basis='cc-pvdz', verbose=0)
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.kernel()
    assert mf.converged
    cc = mf.CCSD()
    cc.conv_tol = 1e-10
    cc.kernel()
    assert cc.converged
    # reference pyscf/cc/test/test_rccsd.py golden for this system
    assert abs(cc.e_corr - (-0.2133432312951)) < 1e-6
    return cc


def test_ipccsd_roots(h2o_ccsd):
    from pyscf_tpu.cc.eom_rccsd import ipccsd
    e, v = ipccsd(h2o_ccsd, nstates=3)
    e = np.sort(np.asarray(e))
    ref = [0.4335604332073799, 0.5187659896045407, 0.6782876002229172]
    for i, r in enumerate(ref):
        assert abs(e[i] - r) < 1e-5, (i, e[i], r)


def test_eaccsd_roots(h2o_ccsd):
    from pyscf_tpu.cc.eom_rccsd import eaccsd
    e, v = eaccsd(h2o_ccsd, nstates=2)
    e = np.sort(np.asarray(e))
    ref = [0.16737886338859731, 0.24027613852009164]
    for i, r in enumerate(ref):
        assert abs(e[i] - r) < 1e-5, (i, e[i], r)


def test_eomee_singlet_root(h2o_ccsd):
    from pyscf_tpu.cc.eom_rccsd import eomee_ccsd_singlet
    e, v = eomee_ccsd_singlet(h2o_ccsd, nstates=1)
    e = np.atleast_1d(np.asarray(e))
    assert abs(e[0] - 0.3005716731825082) < 1e-5, e[0]


@pytest.mark.slow
def test_ip_vs_spinorbital_gccsd():
    """Spatial EOM-IP must agree with the spin-orbital eom_gccsd sigma
    implementation on a small system (internal cross-validation)."""
    mol = pt.M(atom='Be 0 0 0; H 0 0 1.3; H 0 0 -1.3', basis='sto-3g',
               verbose=0)
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.kernel()
    cc = mf.CCSD()
    cc.conv_tol = 1e-10
    cc.kernel()
    from pyscf_tpu.cc.eom_rccsd import ipccsd
    e_r, _ = ipccsd(cc, nstates=2)
    from pyscf_tpu.cc import gccsd as gmod
    gcc = gmod.GCCSD(mf)
    gcc.conv_tol = 1e-10
    gcc.kernel()
    from pyscf_tpu.cc.eom_gccsd import EOMIP
    e_g = EOMIP(gcc).kernel(4)
    eg = np.unique(np.round(np.sort(np.asarray(e_g)), 6))
    er = np.sort(np.asarray(e_r))
    assert abs(er[0] - eg[0]) < 1e-5, (er, eg)
