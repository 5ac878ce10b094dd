"""Boys orbital localization (analog of reference pyscf/lo/boys.py).

Maximizes sum_i |<i|r|i>|^2 by Jacobi sweeps over orbital pairs — small
dense problem, host-side with device dipole integrals.
"""
import numpy as np


def kernel(mol, mo_coeff, max_cycle=200, conv_tol=1e-10):
    mo = np.asarray(mo_coeff).copy()
    r_ints = np.asarray(mol.intor('int1e_r'))       # (3, nao, nao)
    n = mo.shape[1]
    for it in range(max_cycle):
        r_mo = np.einsum('xuv,ui,vj->xij', r_ints, mo, mo)
        change = 0.0
        for i in range(n):
            for j in range(i + 1, n):
                rii = r_mo[:, i, i]
                rjj = r_mo[:, j, j]
                rij = r_mo[:, i, j]
                a = rij @ rij - 0.25 * (rii - rjj) @ (rii - rjj)
                b = rij @ (rii - rjj)
                if abs(a) < 1e-14 and abs(b) < 1e-14:
                    continue
                theta = 0.25 * np.arctan2(b, -a)
                c, s = np.cos(theta), np.sin(theta)
                gain = a + np.sqrt(a * a + b * b)
                if gain < 1e-12:
                    continue
                mo_i = mo[:, i] * c + mo[:, j] * s
                mo_j = -mo[:, i] * s + mo[:, j] * c
                mo[:, i], mo[:, j] = mo_i, mo_j
                # update r_mo rows/cols for i, j
                r_mo = np.einsum('xuv,ui,vj->xij', r_ints, mo, mo)
                change += abs(theta)
        if change < conv_tol:
            break
    return mo


class Boys:
    def __init__(self, mol, mo_coeff=None):
        self.mol = mol
        self.mo_coeff = mo_coeff

    def kernel(self, mo_coeff=None):
        mo = mo_coeff if mo_coeff is not None else self.mo_coeff
        return kernel(self.mol, mo)
