"""Selected CI: exactness at zero cutoff, variational bound, PT2."""
import numpy as np

import pyscf_tpu as pt
from pyscf_tpu.fci import direct_spin1, selected_ci


def _random_h(norb, seed=3):
    rng = np.random.default_rng(seed)
    h1 = rng.standard_normal((norb, norb))
    h1 = (h1 + h1.T) / 2
    eri = rng.standard_normal((norb,) * 4)
    eri = eri + eri.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)
    return h1, eri / 8


def test_sci_equals_fci_at_zero_cutoff():
    h1, eri = _random_h(5)
    e_fci, _ = direct_spin1.kernel(h1, eri, 5, (2, 2))
    e_sci, (dets, c) = selected_ci.kernel(h1, eri, 5, (2, 2),
                                          select_cutoff=0.0)
    assert abs(e_sci - e_fci) < 1e-10


def test_sci_variational_and_pt2():
    h1, eri = _random_h(6, seed=11)
    e_fci, _ = direct_spin1.kernel(h1, eri, 6, (3, 3))
    s = selected_ci.SelectedCI(select_cutoff=5e-2)
    e_var, _ = s.kernel(h1, eri, 6, (3, 3), max_iter=1)
    assert e_var >= e_fci - 1e-10          # variational
    assert e_var - e_fci > 1e-8            # genuinely truncated
    e_pt2 = e_var + s.e_pt2
    assert abs(e_pt2 - e_fci) < abs(e_var - e_fci)   # PT2 improves


def test_sci_h2o_cas():
    mol = pt.M(atom='O 0 0 0; H 0 -0.757 0.587; H 0 0.757 0.587',
               basis='sto-3g', verbose=0)
    mf = pt.scf.RHF(mol)
    mf.kernel()
    from pyscf_tpu.mcscf import CASCI
    mc = CASCI(mf, 6, 8)
    h1cas, ecore = mc.h1e_for_cas()
    eri_cas = np.asarray(mc.get_h2eff()).reshape(6, 6, 6, 6)
    e_exact, _ = direct_spin1.kernel(np.asarray(h1cas), eri_cas, 6, (4, 4),
                                     ecore=ecore)
    s = selected_ci.SelectedCI(select_cutoff=1e-5)
    e_sci, _ = s.kernel(np.asarray(h1cas), eri_cas, 6, (4, 4), ecore=ecore)
    assert abs(e_sci - e_exact) < 1e-8
