"""Initial guesses (atomic SCF, Hückel) + AutoAux auxiliary generation
+ SCAN functional sanity."""
import numpy as np
import pytest

import pyscf_tpu as pt


def _h2o(basis='sto-3g'):
    return pt.M(atom='O 0 0 0.1174; H 0 0.7572 -0.4696; '
                     'H 0 -0.7572 -0.4696', basis=basis, verbose=0)


def test_atom_sph_rhf():
    from pyscf_tpu.scf.atom_hf import atom_sph_rhf
    e, mo_e, mo_c, occ = atom_sph_rhf('O', 'sto-3g')
    assert abs(occ.sum() - 8.0) < 1e-12
    # spherically-averaged O/STO-3G RHF sits near the true atomic RHF
    assert -75.0 < e < -73.0
    assert mo_e[0] < -19.0                 # 1s well below valence


@pytest.mark.parametrize('key', ['minao', 'atom', 'huckel', 'mod_huckel',
                                 'sap'])
def test_init_guess_converges(key):
    mol = _h2o()
    mf = mol.RHF()
    mf.init_guess = key
    dm = np.asarray(mf.get_init_guess())
    s = np.asarray(mol.intor('int1e_ovlp'))
    ne = float(np.einsum('ij,ji->', dm, s))
    assert abs(ne - mol.nelectron) < 0.2
    e = mf.kernel(dm0=dm)
    assert mf.converged
    assert abs(e - (-74.963)) < 5e-3


def test_autoaux():
    from pyscf_tpu.df import autoaux
    mol = _h2o('6-31g')
    aux = autoaux(mol)
    assert set(aux) == {'O', 'H'}
    lmax_o = max(e[0] for e in aux['O'])
    assert lmax_o >= 2                      # beyond s/p products
    assert len(aux['O']) > len(aux['H'])
    # DF-SCF with the generated auxbasis reproduces exact RHF closely
    e_ref = mol.RHF().kernel()
    mf = mol.RHF().density_fit(auxbasis='autoaux')
    e_df = mf.kernel()
    assert mf.converged
    assert abs(e_df - e_ref) < 5e-4


def test_scan_functional():
    import jax.numpy as jnp
    from pyscf_tpu.dft import xc as xc_mod
    fn = xc_mod.parse_xc('SCAN')
    assert fn.is_mgga
    # uniform electron gas: SCAN exchange reduces to LDA (Fx = 1)
    rho = jnp.asarray([0.5])
    sigma = jnp.asarray([1e-14])
    # tau for the UEG: (3/10)(3 pi^2)^{2/3} rho^{5/3} per spin-summed n
    n = 2.0 * rho
    tau_ueg = 0.3 * (3 * jnp.pi ** 2) ** (2.0 / 3.0) * n ** (5.0 / 3.0) / 2.0
    from pyscf_tpu.dft import xc_funcs as F
    ex = F.scan_x(rho, rho, sigma, sigma, tau_ueg, tau_ueg)
    ex_lda = F.lda_x(rho, rho)
    assert abs(float(ex[0] - ex_lda[0]) / float(ex_lda[0])) < 1e-6


@pytest.mark.slow
def test_scan_he_energy():
    mol = pt.M(atom='He 0 0 0', basis='cc-pvdz', verbose=0)
    mf = mol.RKS(xc='SCAN')
    e = mf.kernel()
    assert mf.converged
    # He SCAN/cc-pVDZ total energy, loose physical window
    assert -2.92 < e < -2.85
