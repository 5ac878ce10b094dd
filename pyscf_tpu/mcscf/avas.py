"""AVAS: atomic valence active space selection.

Reference analog: pyscf/mcscf/avas.py (Sayfutyarova, Sun, Chan, Knizia,
JCTC 13, 4063 (2017)). The occupied and virtual MO blocks are rotated to
diagonalize their projection onto a set of target minimal-basis AOs;
orbitals whose projection eigenvalue exceeds the threshold form the
active space.
"""
import numpy as np

from ..gto.mole import Mole
from ..ops.integrals.int1e import int1e_ovlp_cross

_LCHAR = 'spdfgh'
_BASE_N = {'s': 1, 'p': 2, 'd': 3, 'f': 4}


def minao_labels(mol):
    """['0 O 1s', '0 O 2s', '0 O 2px', ...] for the minao reference basis
    of mol, with chemistry-convention principal quantum numbers."""
    ref = Mole(atom=[(s, tuple(c)) for s, c in
                     zip(mol.raw_symbols, mol.coords)],
               basis='minao', unit='bohr', verbose=0).build()
    counts = {}
    labels = []
    mchar = {0: [''], 1: ['x', 'y', 'z'],
             2: ['xy', 'yz', 'z^2', 'xz', 'x2-y2'],
             3: [str(m) for m in range(-3, 4)]}
    for sh in ref._shells:
        ia, l = sh.atom_id, sh.l
        n = counts.get((ia, l), _BASE_N[_LCHAR[l]])
        counts[(ia, l)] = n + 1
        symb = mol.raw_symbols[ia]
        for m in range(2 * l + 1):
            mc = mchar.get(l, [str(x) for x in range(2 * l + 1)])[m]
            labels.append(f'{ia} {symb} {n}{_LCHAR[l]}{mc}')
    return ref, labels


def avas(mf, ao_labels, threshold=0.2, canonicalize=True):
    """Select an active space covering the given minimal-basis AOs.

    ao_labels: list of substrings matched against minao_labels entries,
    e.g. ['O 2p'] or ['Fe 3d', 'Fe 4d'].

    Returns (ncas, nelecas, mo) with mo ordered core | active | virtual.
    """
    mol = mf.mol
    ref, labels = minao_labels(mol)
    sel = np.array([any(pat in lb for pat in ao_labels) for lb in labels])
    if not sel.any():
        raise ValueError(f'no minao AO matches {ao_labels}')
    s11 = np.asarray(mol.intor('int1e_ovlp'))
    s22 = np.asarray(ref.intor('int1e_ovlp'))[np.ix_(sel, sel)]
    s12 = np.asarray(int1e_ovlp_cross(mol, ref))[:, sel]
    # projector onto the span of the target AOs, in the AO metric
    p = s12 @ np.linalg.solve(s22, s12.T)

    occ = np.asarray(mf.mo_occ) > 0
    c = np.asarray(mf.mo_coeff)
    co, cv = c[:, occ], c[:, ~occ]
    wo, uo = np.linalg.eigh(co.T @ p @ co)
    wv, uv = np.linalg.eigh(cv.T @ p @ cv)
    # ascending eigenvalues: active occupieds are the tail, active
    # virtuals the tail reversed to sit right above the Fermi level
    nocc_act = int((wo > threshold).sum())
    nvir_act = int((wv > threshold).sum())
    co_r = co @ uo
    cv_r = cv @ uv[:, ::-1]
    mo = np.hstack([co_r, cv_r])
    ncas = nocc_act + nvir_act
    nelecas = 2 * nocc_act - (0 if mol.spin == 0 else 0)
    na = (nelecas + mol.spin) // 2
    nb = nelecas - na
    if canonicalize:
        # semicanonicalize each block with the converged Fock operator,
        # reconstructed from the canonical MOs: F = S C diag(e) C^T S
        e_mo = np.asarray(mf.mo_energy)
        fao = s11 @ (c * e_mo[None, :]) @ c.T @ s11
        if fao is not None:
            ncore = co.shape[1] - nocc_act
            for sl in (slice(0, ncore), slice(ncore, ncore + nocc_act),
                       slice(ncore + nocc_act, ncore + ncas),
                       slice(ncore + ncas, mo.shape[1])):
                blk = mo[:, sl]
                if blk.shape[1] == 0:
                    continue
                fb = blk.T @ fao @ blk
                _, u = np.linalg.eigh(0.5 * (fb + fb.T))
                mo[:, sl] = blk @ u
    return ncas, (na, nb), mo
