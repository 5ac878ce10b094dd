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
    from ..ops.integrals.j1e import hcore_parts
    s = np.asarray(hcore_parts(mol)[0])   # device-resident screened S
    s_cross = np.asarray(int1e_ovlp_cross(mol, minao_mol))
    p = np.linalg.solve(s, s_cross)              # (nao, nao_minao)
    dm = (p * occ[None, :]) @ p.T
    return jnp.asarray(dm)


def init_guess_by_atom(mol):
    """Superposition of spherically-averaged atomic SCF densities in the
    molecule's own basis (reference scf/hf.py init_guess_by_atom via
    atom_hf.get_atm_nrhf)."""
    from .atom_hf import get_atm_nrhf
    atm = get_atm_nrhf(mol)
    nao = mol.nao
    dm = np.zeros((nao, nao))
    for ia, (symb, (p0, p1)) in enumerate(zip(mol.raw_symbols,
                                              _aoslice(mol))):
        _, e, c, occ = atm[symb]
        dm[p0:p1, p0:p1] = (c * occ[None, :]) @ c.T
    return jnp.asarray(dm)


def _aoslice(mol):
    """[(ao_start, ao_end)] per atom (contiguous shell layout)."""
    bounds = []
    for ia in range(mol.natm):
        idx = [i for i, sh in enumerate(mol._shells) if sh.atom_id == ia]
        if idx:
            p0 = int(mol.ao_loc[min(idx)])
            p1 = int(mol.ao_loc[max(idx) + 1])
        else:
            p0 = p1 = int(mol.ao_loc[-1])
        bounds.append((p0, p1))
    return bounds


def _huckel_orbitals(mol, updated_rule=False):
    """GWH orbitals from on-the-fly atomic SCF (reference scf/hf.py:583
    _init_guess_huckel_orbitals, doi:10.1021/acs.jctc.8b01089)."""
    from .atom_hf import get_atm_nrhf
    atm = get_atm_nrhf(mol)
    nao = mol.nao
    slices = _aoslice(mol)

    orb_E, orb_C = [], []
    for ia, symb in enumerate(mol.raw_symbols):
        _, e, c, occ = atm[symb]
        p0, p1 = slices[ia]
        for k in np.nonzero(occ > 0.0)[0]:
            cfull = np.zeros(nao)
            cfull[p0:p1] = c[:, k]
            orb_C.append(cfull)
            orb_E.append(e[k])
    orb_E = np.asarray(orb_E)
    orb_C = np.asarray(orb_C).T                       # (nao, nocc_at)

    s = np.asarray(mol.intor('int1e_ovlp'))
    s_ho = orb_C.T @ s @ orb_C
    k = 1.75
    if updated_rule:
        # updated GWH rule, J. Am. Chem. Soc. 100, 3686 (1978)
        delta = (orb_E[:, None] - orb_E[None, :]) / \
            (orb_E[:, None] + orb_E[None, :])
        kij = k + delta ** 2 + delta ** 4 * (1.0 - k)
    else:
        kij = k
    h = 0.5 * kij * (orb_E[:, None] + orb_E[None, :]) * s_ho
    np.fill_diagonal(h, orb_E)

    # generalized eigenproblem in the atomic-orbital metric
    w, v = np.linalg.eigh(s_ho)
    keep = w > 1e-9
    x = v[:, keep] / np.sqrt(w[keep])[None, :]
    ev, u = np.linalg.eigh(x.T @ h @ x)
    return ev, orb_C @ (x @ u)


def _aufbau_rdm1(mol, mo_energy, mo_coeff):
    nmo = mo_coeff.shape[1]
    na, nb = mol.nelec
    occ = np.zeros(nmo)
    occ[:min(nb, nmo)] = 2.0
    if na > nb and na <= nmo:
        occ[nb:na] = 1.0
    return (mo_coeff * occ[None, :]) @ mo_coeff.T


def init_guess_by_huckel(mol):
    """Extended-Hückel guess (reference scf/hf.py:543)."""
    e, c = _huckel_orbitals(mol, updated_rule=False)
    return jnp.asarray(_aufbau_rdm1(mol, e, c))


def init_guess_by_mod_huckel(mol):
    """Hückel guess with the updated GWH rule (reference scf/hf.py:554)."""
    e, c = _huckel_orbitals(mol, updated_rule=True)
    return jnp.asarray(_aufbau_rdm1(mol, e, c))


def _sap_basis(symb):
    import gzip
    import json
    import os
    global _SAP_TABLE
    try:
        tab = _SAP_TABLE
    except NameError:
        path = os.path.join(os.path.dirname(__file__), '..', 'gto',
                            'basis_data', 'sapgrasplarge.json.gz')
        tab = _SAP_TABLE = json.load(gzip.open(path, 'rt'))
    return tab[symb]


def init_guess_by_sap(mol):
    """Superposition of atomic potentials guess (Lehtola, JCTC 15, 1593
    (2019); Gaussian-fit potentials of doi:10.1063/5.0004046).

    Reference analog: scf/hf.py:744 init_guess_by_sap + make_sap:807,
    which route V_sap through libcint int3c2e against fake unit-charge
    shells.  Here each fitted Gaussian charge has the closed-form
    potential erf(sqrt(a) r)/r, so V_sap is evaluated on the standard
    Becke grid and contracted with AO values — pure batched matmuls.
    """
    import jax
    from ..dft import gen_grid
    from ..ops.eval_gto import eval_gto

    grids = gen_grid.Grids(mol).build()
    coords = jnp.asarray(grids.coords)
    weights = jnp.asarray(grids.weights)
    v = jnp.zeros(coords.shape[0])
    centers = np.asarray(mol.coords)
    for A, symb in enumerate(mol.raw_symbols):
        exps, cs = [], []
        for shell in _sap_basis(symb):
            for e_c in shell[1:]:
                exps.append(e_c[0])
                cs.append(e_c[1])
        exps = jnp.asarray(exps)
        cs = jnp.asarray(cs)
        r = jnp.linalg.norm(coords - jnp.asarray(centers[A])[None, :],
                            axis=1)
        r = jnp.maximum(r, 1e-12)
        # potential of a unit gaussian charge: erf(sqrt(a) r)/r
        pot = jax.scipy.special.erf(
            jnp.sqrt(exps)[None, :] * r[:, None]) / r[:, None]
        v = v + pot @ cs          # coefficients sum to -Z: attractive
    ao = jnp.asarray(eval_gto(mol, 'GTOval_sph', np.asarray(coords)))
    vsap = jnp.einsum('gi,g,gj->ij', ao, weights * v, ao)

    from ..lib.linalg import canonical_orth
    h = jnp.asarray(mol.intor('int1e_kin')) + jnp.asarray(
        mol.intor('int1e_nuc')) + vsap
    s = jnp.asarray(mol.intor('int1e_ovlp'))
    x = canonical_orth(np.asarray(s))
    e, cp = jnp.linalg.eigh(x.T @ h @ x)
    c = np.asarray(x @ cp)
    return jnp.asarray(_aufbau_rdm1(mol, np.asarray(e), c))
