"""Pipek-Mezey orbital localization (analog of reference pyscf/lo/pipek.py).

Maximizes sum_iA Q_iA^2 with Mulliken atomic populations
Q_iA = sum_{mu in A} (C^T S C/2-ish) — Jacobi pair sweeps as in Boys,
with the population gain formula of Pipek & Mezey (JCP 90, 4916)."""
import numpy as np


def _ao2atom_map(mol):
    ao2atom = np.zeros(mol.nao, dtype=int)
    for l, g in mol.shell_groups.items():
        for off, ia in zip(g.ao_off, g.atom_ids):
            ao2atom[off:off + 2 * l + 1] = ia
    return ao2atom


def atomic_pops(mol, mo):
    """Mulliken charge matrices Q[A, i, j] per atom (reference
    pipek.py atomic_pops, method='mulliken')."""
    s = np.asarray(mol.intor('int1e_ovlp'))
    ao2atom = _ao2atom_map(mol)
    sc = s @ mo
    Q = np.zeros((mol.natm, mo.shape[1], mo.shape[1]))
    for A in range(mol.natm):
        mask = ao2atom == A
        Q[A] = 0.5 * (mo[mask].T @ sc[mask] + sc[mask].T @ mo[mask])
    return Q


def kernel(mol, mo_coeff, max_cycle=300, conv_tol=1e-10):
    mo = np.asarray(mo_coeff).copy()
    n = mo.shape[1]
    for it in range(max_cycle):
        Q = atomic_pops(mol, mo)
        change = 0.0
        for i in range(n):
            for j in range(i + 1, n):
                qii = Q[:, i, i]
                qjj = Q[:, j, j]
                qij = Q[:, i, j]
                a = qij @ qij - 0.25 * (qii - qjj) @ (qii - qjj)
                b = qij @ (qii - qjj)
                if abs(a) < 1e-14 and abs(b) < 1e-14:
                    continue
                theta = 0.25 * np.arctan2(b, -a)
                gain = a + np.sqrt(a * a + b * b)
                if gain < 1e-12:
                    continue
                c, s_ = np.cos(theta), np.sin(theta)
                mo_i = mo[:, i] * c + mo[:, j] * s_
                mo_j = -mo[:, i] * s_ + mo[:, j] * c
                mo[:, i], mo[:, j] = mo_i, mo_j
                # update Q rows/cols for the rotated pair
                Qi = Q[:, :, i] * c + Q[:, :, j] * s_
                Qj = -Q[:, :, i] * s_ + Q[:, :, j] * c
                Q[:, :, i], Q[:, :, j] = Qi, Qj
                Qi = Q[:, i, :] * c + Q[:, j, :] * s_
                Qj = -Q[:, i, :] * s_ + Q[:, j, :] * c
                Q[:, i, :], Q[:, j, :] = Qi, Qj
                change += abs(gain)
        if change < conv_tol:
            break
    return mo


class PipekMezey:
    def __init__(self, mol, mo_coeff=None):
        self.mol = mol
        self.mo_coeff = mo_coeff

    def kernel(self, mo_coeff=None):
        mo = mo_coeff if mo_coeff is not None else self.mo_coeff
        self.mo_coeff = kernel(self.mol, mo)
        return self.mo_coeff

    run = kernel


PM = PipekMezey
