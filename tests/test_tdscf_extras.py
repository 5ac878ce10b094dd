"""TDA/TDHF triplet excitations, transition dipoles, oscillator
strengths, and NTOs.

Goldens from reference tdscf/test/test_tdrhf.py:41-74 (HF/6-31G) and
test_tdrks.py:141 (TDA-B3LYPG); fingerprint fp(a) = cos(arange).a matches
the reference lib.misc.fingerprint.
"""
import numpy as np
import pytest

import pyscf_tpu as pt
from pyscf_tpu.tdscf.rhf import TDA, TDHF

EV = 27.2114


def fp(a):
    a = np.asarray(a).ravel()
    return float(np.dot(np.cos(np.arange(a.size)), a))


@pytest.fixture(scope='module')
def hf_631g():
    mol = pt.M(atom='H 0 0 .917; F 0 0 0', basis='6-31g')
    mf = mol.RHF()
    mf.init_guess = 'hcore'
    mf.kernel()
    return mol, mf


def test_tda_singlet_golden(hf_631g):
    mol, mf = hf_631g
    td = TDA(mf)
    td.nstates = 5
    e = td.kernel() * EV
    ref = [11.90276464, 11.90276464, 16.86036434]
    assert abs(e[:3] - np.array(ref)).max() < 1e-4
    dip = td.transition_dipole()
    assert abs(fp(np.linalg.norm(dip, axis=1)) - -0.65616659) < 1e-4
    f = td.oscillator_strength()
    assert (f >= -1e-12).all()


def test_tda_triplet_golden(hf_631g):
    mol, mf = hf_631g
    td = TDA(mf)
    td.nstates = 5
    td.singlet = False
    e = td.kernel() * EV
    ref = [11.01747918, 11.01747918, 13.16955056]
    assert abs(e[:3] - np.array(ref)).max() < 1e-4
    assert abs(td.transition_dipole()).max() == 0


def test_tdhf_singlet_golden(hf_631g):
    mol, mf = hf_631g
    td = TDHF(mf)
    td.nstates = 5
    e = td.kernel() * EV
    ref = [11.83487199, 11.83487199, 16.66309285]
    assert abs(e[:3] - np.array(ref)).max() < 1e-4
    dip = td.transition_dipole()
    assert abs(fp(np.linalg.norm(dip, axis=1)) - -0.64009191) < 1e-4


def test_tdhf_triplet_golden(hf_631g):
    mol, mf = hf_631g
    td = TDHF(mf)
    td.nstates = 5
    td.singlet = False
    e = td.kernel() * EV
    ref = [10.8919234, 10.8919234, 12.63440705]
    assert abs(e[:3] - np.array(ref)).max() < 1e-4


def test_nto(hf_631g):
    mol, mf = hf_631g
    td = TDA(mf)
    td.nstates = 3
    td.kernel()
    w, nto = td.get_nto(0)
    assert abs(w.sum() - 1.0) < 1e-10
    assert w[0] > 0.9            # HF lowest excitation is one-pair


def test_davidson_matches_dense(hf_631g):
    """Matrix-free matvec path == dense A for singlet and triplet."""
    mol, mf = hf_631g
    for singlet in (True, False):
        td = TDA(mf)
        td.nstates = 4
        td.singlet = singlet
        e_dense = td.kernel()
        td2 = TDA(mf)
        td2.nstates = 4
        td2.singlet = singlet
        td2.dense_cutoff = 0
        e_dav = td2.kernel()
        assert abs(np.asarray(e_dense) - np.asarray(e_dav)).max() < 1e-7


@pytest.mark.slow
def test_tda_b3lypg_golden(hf_631g):
    """Reference test_tdrks.py:141: fp of 5 TDA-B3LYPG states (eV)."""
    mol, _ = hf_631g
    mf = pt.dft.RKS(mol, xc='b3lypg')
    mf.grids.prune = None
    mf.conv_tol = 1e-10
    mf.kernel()
    td = TDA(mf)
    td.nstates = 5
    es = td.kernel() * EV
    assert abs(fp(es) - -41.385520327568869) < 1e-4


@pytest.mark.slow
def test_tda_lda_golden(hf_631g):
    """Reference test_tdrks.py:150: fp of 5 TDA-LDA states (eV)."""
    mol, _ = hf_631g
    mf = pt.dft.RKS(mol, xc='lda,vwn')
    mf.grids.prune = None
    mf.conv_tol = 1e-10
    mf.kernel()
    td = TDA(mf)
    td.nstates = 5
    es = td.kernel() * EV
    assert abs(fp(es) - -41.201828219760415) < 1e-4


def test_tda_uhf_uks_closed_shell_union():
    """Closed-shell TDA-UHF/UKS == union of the restricted singlet and
    triplet spectra (each once, as the ms=0 components)."""
    from pyscf_tpu.dft.uks import UKS
    from pyscf_tpu.scf.uhf import UHF
    from pyscf_tpu.tdscf.uhf import TDAUHF
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g')
    mf = mol.RHF()
    mf.conv_tol = 1e-12
    mf.init_guess = 'hcore'
    mf.kernel()
    tds = TDA(mf)
    tds.nstates = 4
    es = tds.kernel()
    tdt = TDA(mf)
    tdt.nstates = 4
    tdt.singlet = False
    et = tdt.kernel()
    union = np.sort(np.concatenate([es, et]))
    umf = UHF(mol)
    umf.conv_tol = 1e-12
    umf.kernel()
    eu = TDAUHF(umf).kernel(nstates=6)
    assert abs(np.sort(eu) - union[:6]).max() < 1e-6

    mfk = pt.dft.RKS(mol, xc='pbe,pbe')
    mfk.conv_tol = 1e-10
    mfk.kernel()
    tds = TDA(mfk)
    tds.nstates = 3
    esk = tds.kernel()
    tdt = TDA(mfk)
    tdt.nstates = 3
    tdt.singlet = False
    etk = tdt.kernel()
    unionk = np.sort(np.concatenate([esk, etk]))
    umfk = UKS(mol, xc='pbe,pbe')
    umfk.conv_tol = 1e-10
    umfk.kernel()
    euk = TDAUHF(umfk).kernel(nstates=4)
    assert abs(np.sort(euk) - unionk[:4]).max() < 1e-6
