"""Initial-guess densities (analog of reference pyscf/scf/hf.py:354
init_guess_by_minao and atom_hf.py).

SAD / minao: superposition of spherically-averaged atomic densities in the
Molpro MINAO basis, projected onto the computational basis by
P = S^-1 S_cross  (reference scf/addons.py project_dm_nr2nr).
"""
import numpy as np
import jax.numpy as jnp

from ..data import elements
from ..gto.mole import Mole


def _minao_occupancy(symb, z):
    """Spherically-averaged occupancies per minao AO for one element."""
    from ..gto import basis as basis_mod
    raw = basis_mod.load('minao', symb)
    # count functions per l in shell order (after splitting contractions)
    shells = []       # (l,) per segmented shell, in order
    for entry in raw:
        l = entry[0]
        ncol = len(entry[1]) - 1
        for _ in range(ncol):
            shells.append(l)
    conf = list(elements.CONFIGURATION[z])
    occs = []
    remaining = {l: float(conf[l]) if l < 4 else 0.0 for l in range(8)}
    # fill shells in listed order per l
    for l in shells:
        cap = 2.0 * (2 * l + 1)
        take = min(cap, remaining.get(l, 0.0))
        remaining[l] = remaining.get(l, 0.0) - take
        occs.extend([take / (2 * l + 1)] * (2 * l + 1))
    return np.array(occs)


def init_guess_by_minao(mol):
    """SAD density matrix in mol's AO basis."""
    from ..ops.integrals.int1e import int1e_ovlp_cross
    minao_mol = Mole(atom=list(zip(mol.raw_symbols, mol.coords)),
                     basis='minao', unit='bohr', verbose=0).build()
    occ = []
    for ia, symb in enumerate(mol.elements_):
        occ.append(_minao_occupancy(symb, int(mol.charges[ia])))
    occ = np.concatenate(occ)
    s = np.asarray(mol.intor('int1e_ovlp'))
    s_cross = np.asarray(int1e_ovlp_cross(mol, minao_mol))
    p = np.linalg.solve(s, s_cross)              # (nao, nao_minao)
    dm = (p * occ[None, :]) @ p.T
    return jnp.asarray(dm)


def init_guess_by_atom(mol):
    """Alias: SAD is the atomic-density superposition guess here."""
    return init_guess_by_minao(mol)
