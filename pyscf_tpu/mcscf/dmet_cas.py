"""DMET-CAS: active space from the Schmidt decomposition of the HF
density around labeled impurity AOs.

Reference analog: pyscf/mcscf/dmet_cas.py (guess_cas). In the
meta-Lowdin orthogonal AO basis the density matrix is split into the
impurity block and its environment; environment orbitals with fractional
occupation (entangled with the impurity) join the impurity space to form
the active space.
"""
import numpy as np
import scipy.linalg

from ..lo.orth import orth_ao
from ..mcscf.avas import minao_labels


def guess_cas(mf, ao_labels, occ_cutoff=1e-8):
    """(ncas, nelecas, mo) with mo ordered core | active | virtual."""
    mol = mf.mol
    dm = np.asarray(mf.make_rdm1())
    if dm.ndim == 3:
        dm = dm[0] + dm[1]
    s = np.asarray(mol.intor('int1e_ovlp'))
    c_orth = np.asarray(orth_ao(mol, 'meta_lowdin', s))
    # labels of the computational basis via the minao-label generator
    # pattern: match against per-AO (atom, shell) labels
    from ..mcscf.avas import _LCHAR, _BASE_N
    counts = {}
    labels = []
    mchar = {0: [''], 1: ['x', 'y', 'z'],
             2: ['xy', 'yz', 'z^2', 'xz', 'x2-y2']}
    for sh in mol._shells:
        ia, l = sh.atom_id, sh.l
        n = counts.get((ia, l), _BASE_N.get(_LCHAR[l], l + 1))
        counts[(ia, l)] = n + 1
        symb = mol.raw_symbols[ia]
        for m in range(2 * l + 1):
            mc = mchar.get(l, [str(x) for x in range(2 * l + 1)])[m]
            labels.append(f'{ia} {symb} {n}{_LCHAR[l]}{mc}')
    sel = np.array([any(p in lb for p in ao_labels) for lb in labels])
    if not sel.any():
        raise ValueError(f'no AO matches {ao_labels}')
    imp = np.where(sel)[0]
    env = np.where(~sel)[0]

    # density in the orthogonal basis
    p = c_orth.T @ s @ dm @ s @ c_orth
    # environment block eigen-decomposition: entangled orbitals have
    # fractional occupations
    pe = p[np.ix_(env, env)]
    w, v = np.linalg.eigh(pe)
    frac = (w > occ_cutoff) & (w < 2.0 - occ_cutoff)
    n_core = int((w >= 2.0 - occ_cutoff).sum())
    c_env = c_orth[:, env] @ v
    c_core = c_env[:, w >= 2.0 - occ_cutoff]
    c_ent = c_env[:, frac]
    c_virt_env = c_env[:, w <= occ_cutoff]
    c_imp = c_orth[:, imp]
    c_act = np.hstack([c_imp, c_ent])
    # electrons in the active space: total minus the doubly occupied core
    nelecas = mol.nelectron - 2 * n_core
    ncas = c_act.shape[1]
    na = (nelecas + mol.spin) // 2
    nb = nelecas - na
    # orthonormalize the active block against the core
    mo = np.hstack([c_core, c_act, c_virt_env])
    # symmetric re-orthonormalization (blocks are orthogonal by
    # construction in the orth-AO metric; guard numerics)
    m = mo.T @ s @ mo
    mo = mo @ scipy.linalg.fractional_matrix_power(m, -0.5).real
    return ncas, (na, nb), mo
