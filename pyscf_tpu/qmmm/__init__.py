"""QM/MM point-charge embedding (analog of reference pyscf/qmmm/itrf.py:36
add_mm_charges).

The MM potential sum_i -q_i <mu|1/|r-C_i||nu> reuses the batched
nuclear-attraction kernel with the MM charges/coordinates as the "nuclei".
"""
import numpy as np
import jax.numpy as jnp


def mm_potential(mol, coords_mm, charges_mm):
    """AO matrix of the MM point-charge potential (attractive for q>0)."""
    from ..ops.integrals.int1e import _assemble, nuc_chunk, ATOM_PAD
    coords_mm = np.asarray(coords_mm, dtype=float).reshape(-1, 3)
    charges_mm = np.asarray(charges_mm, dtype=float)
    n = len(charges_mm)
    npad = -(-n // ATOM_PAD) * ATOM_PAD
    c = np.zeros((npad, 3))
    c[:n] = coords_mm
    q = np.zeros(npad)
    q[:n] = charges_mm
    return _assemble(mol, nuc_chunk, extra=(jnp.asarray(c), jnp.asarray(q)))


def add_mm_charges(mf, coords_mm, charges_mm, unit='angstrom'):
    """Wrap a mean-field object with MM point charges (QM/MM embedding)."""
    from ..lib.parameters import BOHR
    coords_mm = np.asarray(coords_mm, dtype=float).reshape(-1, 3)
    if unit.lower().startswith('a'):
        coords_mm = coords_mm / BOHR
    charges_mm = np.asarray(charges_mm, dtype=float)
    mol = mf.mol
    v_mm = mm_potential(mol, coords_mm, charges_mm)
    hcore_orig = mf.get_hcore

    def get_hcore(mol_=None):
        return hcore_orig(mol_) + v_mm

    mf.get_hcore = get_hcore
    # nuclear-MM interaction
    z = np.asarray(mol.charges, dtype=float)
    r = np.asarray(mol.coords)
    d = np.linalg.norm(r[:, None, :] - coords_mm[None, :, :], axis=2)
    e_nuc_mm = float((z[:, None] * charges_mm[None, :] / d).sum())
    enuc_orig = mf.energy_nuc

    def energy_nuc():
        return enuc_orig() + e_nuc_mm

    mf.energy_nuc = energy_nuc
    mf._mm = (coords_mm, charges_mm)
    return mf


mm_charge = add_mm_charges


def mm_gradient(mf, coords_mm, charges_mm, dm=None, unit='angstrom'):
    """Forces on the MM point charges from the converged QM density,
    dE/dR_mm (reference analog: qmmm/itrf.py mm_charge_grad).

    The electronic part is the Hellmann-Feynman field of the density at
    each charge (int1e_iprinv with the charge as the operator center);
    the nuclear part is the classical Coulomb force. FD-validated in
    tests/test_qmmm_grad.py.
    """
    from ..lib.parameters import BOHR
    from ..ops.integrals.int1e_deriv import int1e_iprinv
    mol = mf.mol
    coords_mm = np.asarray(coords_mm, dtype=float).reshape(-1, 3)
    if unit.lower().startswith('a'):
        coords_mm = coords_mm / BOHR
    charges_mm = np.asarray(charges_mm, dtype=float)
    if dm is None:
        dm = np.asarray(mf.make_rdm1())
    if dm.ndim == 3:
        dm = dm[0] + dm[1]
    z = np.asarray(mol.charges, dtype=float)
    rq = np.asarray(mol.coords)
    out = np.zeros_like(coords_mm)
    for k in range(len(charges_mm)):
        # electronic: E_el = -q Tr(dm <1/|r-C|>); with the codebase's
        # iprinv convention iprinv = -d<1/|r-C|>/dC (same sign set the
        # validated nuclear gradients use), so dE_el/dC = +q Tr(dm iprinv)
        ip = np.asarray(int1e_iprinv(mol, coords_mm[k]))
        out[k] += charges_mm[k] * np.einsum('xij,ij->x', ip, dm)
        # nuclear-MM Coulomb force
        d = coords_mm[k] - rq
        r3 = np.linalg.norm(d, axis=1) ** 3
        out[k] -= charges_mm[k] * np.einsum('a,ax->x', z / r3, d)
    return out
