"""MO composition analysis (analog of reference pyscf/tools/mo_mapping.py)."""
import numpy as np


def mo_comps(ao_indices, mol, mo_coeff, orth_method='meta_lowdin'):
    """Fraction of each MO living on the given AO indices (in an
    orthogonalized AO basis; reference mo_mapping.py mo_comps)."""
    from ..lo.orth import orth_ao
    s = np.asarray(mol.intor('int1e_ovlp'))
    c_oao = orth_ao(mol, orth_method, s)
    mo_o = np.linalg.solve(c_oao, np.asarray(mo_coeff))
    frac = (mo_o[np.asarray(ao_indices)] ** 2).sum(axis=0)
    return frac / (mo_o ** 2).sum(axis=0)


def mo_1to1map(s12):
    """Index map matching MOs of two calculations by max overlap."""
    return np.argmax(np.abs(np.asarray(s12)), axis=1)
