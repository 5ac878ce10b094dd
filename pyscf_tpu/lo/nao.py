"""Natural atomic orbitals (NAO) and natural population analysis.

Reference analog: pyscf/lo/nao.py (Reed & Weinhold, JCP 83, 735 (1985)).
Pre-NAOs diagonalize the symmetry-averaged atomic density blocks; the
natural-minimal-basis (core+valence) set is occupancy-weighted
symmetrically orthogonalized, Rydberg functions are Schmidt-projected out
and Lowdin-orthogonalized among themselves.
"""
import numpy as np

from ..data import elements
from .orth import lowdin


def _shells_by_atom_l(mol):
    """{(atom, l): [ao_offset_of_each_radial_shell]} in AO order."""
    groups = {}
    for ish, sh in enumerate(mol._shells):
        groups.setdefault((sh.atom_id, sh.l), []).append(int(mol.ao_loc[ish]))
    return groups


def _n_minimal_shells(symb, l):
    """Number of occupied shells of angular momentum l in the free atom
    (core + valence = the natural minimal basis count)."""
    conf = elements.CONFIGURATION[elements.charge(symb)]
    # conf = electron counts per l-channel (s, p, d, f)
    if l >= len(conf) or conf[l] == 0:
        return 0
    full = 2 * (2 * l + 1)
    return int(np.ceil(conf[l] / full))


def prenao(mol, dm):
    """Pre-NAOs: eigenvectors of the m-averaged atomic density blocks.

    Returns (occupancies, coefficients) with coefficients (nao, nao);
    each column is nonzero only on one atom's l-shell block.
    """
    s = np.asarray(mol.intor('int1e_ovlp'))
    p = s @ np.asarray(dm) @ s
    nao = mol.nao
    occ = np.zeros(nao)
    cmat = np.zeros((nao, nao))
    for (ia, l), offs in _shells_by_atom_l(mol).items():
        nr = len(offs)
        deg = 2 * l + 1
        pave = np.zeros((nr, nr))
        save = np.zeros((nr, nr))
        for m in range(deg):
            idx = np.array(offs) + m
            pave += p[np.ix_(idx, idx)]
            save += s[np.ix_(idx, idx)]
        pave /= deg
        save /= deg
        import scipy.linalg
        w, v = scipy.linalg.eigh(pave, save)
        w, v = w[::-1], v[:, ::-1]          # descending occupancy
        for m in range(deg):
            idx = np.array(offs) + m
            for k in range(nr):
                occ[idx[k]] = w[k]
                cmat[idx, idx[k]] = v[:, k]
    return occ, cmat


def _owso(c, w, s):
    """Occupancy-weighted symmetric orthogonalization of columns of c."""
    wd = np.diag(w + 1e-8)
    cw = c @ wd
    return cw @ lowdin(cw.T @ s @ cw)


def nao(mol, mf=None, dm=None):
    """NAO coefficients (nao, nao), orthonormal in the AO overlap metric."""
    if dm is None:
        dm = np.asarray(mf.make_rdm1())
    if dm.ndim == 3:                        # UHF-style (2, nao, nao)
        dm = dm[0] + dm[1]
    s = np.asarray(mol.intor('int1e_ovlp'))
    occ, pre = prenao(mol, dm)

    # natural-minimal-basis selection per (atom, l), by occupancy rank
    nmb_mask = np.zeros(mol.nao, dtype=bool)
    for (ia, l), offs in _shells_by_atom_l(mol).items():
        symb = mol.raw_symbols[ia]
        nmin = _n_minimal_shells(symb, l)
        deg = 2 * l + 1
        for m in range(deg):
            idx = np.array(offs) + m
            order = np.argsort(-occ[idx])
            nmb_mask[idx[order[:nmin]]] = True

    nmb = np.where(nmb_mask)[0]
    ryd = np.where(~nmb_mask)[0]
    cnao = np.zeros((mol.nao, mol.nao))
    c_nmb = _owso(pre[:, nmb], occ[nmb], s)
    cnao[:, nmb] = c_nmb
    if len(ryd):
        # project NMB space out of the Rydberg functions, then Lowdin
        proj = c_nmb @ (c_nmb.T @ s)
        c_r = pre[:, ryd] - proj @ pre[:, ryd]
        cnao[:, ryd] = c_r @ lowdin(c_r.T @ s @ c_r)
    return cnao


def npa_charges(mol, mf=None, dm=None):
    """Natural population analysis atomic charges."""
    if dm is None:
        dm = np.asarray(mf.make_rdm1())
    if dm.ndim == 3:
        dm = dm[0] + dm[1]
    s = np.asarray(mol.intor('int1e_ovlp'))
    c = nao(mol, dm=dm)
    pop = np.diag(c.T @ s @ dm @ s @ c)
    from .orth import _ao2atom_map
    ao2atom = _ao2atom_map(mol)
    chg = np.array(mol.charges, dtype=float)
    for mu, p in zip(ao2atom, pop):
        chg[mu] -= p
    return chg
