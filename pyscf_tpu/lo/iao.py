"""Intrinsic atomic orbitals (IAO) and intrinsic bond orbitals (IBO).

Reference analog: pyscf/lo/iao.py (Knizia, JCTC 9, 4834 (2013)) and
pyscf/lo/ibo.py (IBO = Pipek-Mezey localization with IAO populations).
"""
import numpy as np

from ..gto.mole import Mole
from ..ops.integrals.int1e import int1e_ovlp_cross
from .orth import lowdin


def _minao_mol(mol):
    return Mole(atom=[(s, tuple(c)) for s, c in
                      zip(mol.raw_symbols, mol.coords)],
                basis='minao', unit='bohr', charge=mol.charge,
                spin=mol.spin, verbose=0).build()


def _vec_lowdin(c, s):
    """Orthonormalize columns of c in the metric s."""
    m = c.T @ s @ c
    return c @ lowdin(m)


def iao(mol, orbocc):
    """IAO coefficients (nao, n_minao) for the given occupied orbitals."""
    orbocc = np.asarray(orbocc)
    mol2 = _minao_mol(mol)
    s1 = np.asarray(mol.intor('int1e_ovlp'))
    s2 = np.asarray(mol2.intor('int1e_ovlp'))
    s12 = np.asarray(int1e_ovlp_cross(mol, mol2))
    s21 = s12.T
    p12 = np.linalg.solve(s1, s12)
    # depolarized occupied orbitals
    ctild = np.linalg.solve(s2, s21 @ orbocc)
    ctild = np.linalg.solve(s1, s12 @ ctild)
    ctild = _vec_lowdin(ctild, s1)
    # A = O Otild P12 + (1-O)(1-Otild) P12, O = C C^T S1 (Knizia eq. 2)
    ccs1 = orbocc @ orbocc.T @ s1
    ccs2 = ctild @ ctild.T @ s1
    a = (p12 + 2.0 * ccs1 @ ccs2 @ p12 - ccs1 @ p12 - ccs2 @ p12)
    return _vec_lowdin(a, s1)


def _iao_atom_of(mol):
    """Atom index of each minao function."""
    mol2 = _minao_mol(mol)
    out = np.zeros(mol2.nao, dtype=int)
    for ish, sh in enumerate(mol2._shells):
        out[mol2.ao_loc[ish]:mol2.ao_loc[ish + 1]] = sh.atom_id
    return out


def ibo(mol, orbocc, max_cycle=300, conv_tol=1e-10, exponent=4):
    """Intrinsic bond orbitals: PM localization with IAO charges."""
    orbocc = np.asarray(orbocc)
    a = iao(mol, orbocc)
    s1 = np.asarray(mol.intor('int1e_ovlp'))
    atom_of = _iao_atom_of(mol)
    natm = mol.natm
    # projections of MOs onto IAOs: d[m, i] = <iao_m | i>
    mo = orbocc.copy()
    n = mo.shape[1]

    def pops(mo_):
        d = a.T @ s1 @ mo_                       # (nminao, n)
        q = np.zeros((natm, n, n))
        for ia in range(natm):
            m = atom_of == ia
            q[ia] = d[m].T @ d[m]
        return q

    for it in range(max_cycle):
        q = pops(mo)
        change = 0.0
        for i in range(n):
            for j in range(i + 1, n):
                qii = q[:, i, i]
                qjj = q[:, j, j]
                qij = q[:, i, j]
                a4 = qij @ qij - 0.25 * (qii - qjj) @ (qii - qjj)
                b4 = qij @ (qii - qjj)
                if abs(a4) < 1e-14 and abs(b4) < 1e-14:
                    continue
                theta = 0.25 * np.arctan2(b4, -a4)
                gain = a4 + np.sqrt(a4 * a4 + b4 * b4)
                if gain < 1e-12:
                    continue
                cth, sth = np.cos(theta), np.sin(theta)
                mo_i = mo[:, i] * cth + mo[:, j] * sth
                mo_j = -mo[:, i] * sth + mo[:, j] * cth
                mo[:, i], mo[:, j] = mo_i, mo_j
                q = pops(mo)
                change += abs(theta)
        if change < conv_tol:
            break
    return mo
