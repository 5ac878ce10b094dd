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
