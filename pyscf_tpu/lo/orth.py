"""Orbital orthogonalization schemes (analog of reference pyscf/lo/orth.py):
Lowdin, meta-Lowdin (NAO-style per-atom blocks), canonical."""
import numpy as np
import scipy.linalg


def lowdin(s):
    """S^{-1/2} (symmetric orthogonalization)."""
    w, v = np.linalg.eigh(np.asarray(s))
    keep = w > 1e-12
    return (v[:, keep] / np.sqrt(w[keep])) @ v[:, keep].T


def schmidt(s):
    """Cholesky (Schmidt) orthogonalization: L^{-T}."""
    L = np.linalg.cholesky(np.asarray(s))
    return scipy.linalg.solve_triangular(L, np.eye(L.shape[0]),
                                         lower=True).T


def _ao2atom_map(mol):
    ao2atom = np.zeros(mol.nao, dtype=int)
    for l, g in mol.shell_groups.items():
        for off, ia in zip(g.ao_off, g.atom_ids):
            ao2atom[off:off + 2 * l + 1] = ia
    return ao2atom


def orth_ao(mol, method='meta_lowdin', s=None):
    """Orthogonal AO basis. 'lowdin' is global S^{-1/2}; 'meta_lowdin'
    first Lowdin-orthogonalizes within each atom block, then globally
    (reference orth.py orth_ao) — keeps orbitals atom-assignable for
    population analysis and IAO-style constructions."""
    if s is None:
        s = np.asarray(mol.intor('int1e_ovlp'))
    if method == 'lowdin':
        return lowdin(s)
    if method == 'schmidt':
        return schmidt(s)
    if method != 'meta_lowdin':
        raise NotImplementedError(method)
    ao2atom = _ao2atom_map(mol)
    nao = s.shape[0]
    pre = np.zeros((nao, nao))
    for A in range(mol.natm):
        idx = np.where(ao2atom == A)[0]
        blk = s[np.ix_(idx, idx)]
        pre[np.ix_(idx, idx)] = lowdin(blk)
    s1 = pre.T @ s @ pre
    return pre @ lowdin(s1)
