"""Edmiston-Ruedenberg localization (maximize sum_i (ii|ii)).

Reference analog: pyscf/lo/edmiston.py. Jacobi sweeps over orbital pairs
with the 4-index MO self-repulsion tensor updated per rotation.
"""
import numpy as np

from ..ao2mo import full as ao2mo_full


def kernel(mol, mo_coeff, max_cycle=100, conv_tol=1e-9):
    mo = np.asarray(mo_coeff).copy()
    n = mo.shape[1]
    eri = np.asarray(ao2mo_full(mol, mo)).reshape(n, n, n, n)
    for it in range(max_cycle):
        change = 0.0
        for i in range(n):
            for j in range(i + 1, n):
                # 2x2 Jacobi: maximize (ii|ii)+(jj|jj) under rotation
                # (standard ER pair parameters, Raffenetti et al.)
                g = eri
                Aij = (g[i, j, i, j] - 0.25 * (g[i, i, i, i] + g[j, j, j, j]
                                               - 2 * g[i, i, j, j]))
                Bij = g[i, i, i, j] - g[j, j, i, j]
                if abs(Aij) < 1e-14 and abs(Bij) < 1e-14:
                    continue
                theta = 0.25 * np.arctan2(Bij, -Aij)
                gain = Aij + np.sqrt(Aij * Aij + Bij * Bij)
                if gain < 1e-13:
                    continue
                c, s = np.cos(theta), np.sin(theta)
                mo_i = mo[:, i] * c + mo[:, j] * s
                mo_j = -mo[:, i] * s + mo[:, j] * c
                mo[:, i], mo[:, j] = mo_i, mo_j
                # rotate the 4-index tensor in the (i, j) plane;
                # R[old, new] must match the column update above
                R = np.eye(n)
                R[i, i] = R[j, j] = c
                R[j, i] = s
                R[i, j] = -s
                eri = np.einsum('pqrs,pa,qb,rc,sd->abcd', eri, R, R, R, R,
                                optimize=True)
                change += abs(theta)
        if change < conv_tol:
            break
    return mo


class EdmistonRuedenberg:
    def __init__(self, mol, mo_coeff=None):
        self.mol = mol
        self.mo_coeff = mo_coeff

    def kernel(self, mo_coeff=None):
        mo = mo_coeff if mo_coeff is not None else self.mo_coeff
        return kernel(self.mol, mo)
