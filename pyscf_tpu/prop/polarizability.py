"""Static dipole polarizability by linear response (CPHF/CPKS).

alpha_xy = 4 d_x^T (A+B)^{-1} d_y over the occupied-virtual space with the
same singlet A/B matrices as TDHF/TDDFT (tdscf/rhf.py get_ab); reference
analog pyscf/prop/polarizability + scf/cphf.py.
"""
import numpy as np


class Polarizability:
    def __init__(self, mf):
        self._scf = mf
        self.mol = mf.mol

    def kernel(self):
        mf = self._scf
        mol = self.mol
        from ..tdscf.rhf import get_ab
        a, b = get_ab(mf)
        nocc, nvir = a.shape[0], a.shape[1]
        nov = nocc * nvir
        apb = (np.asarray(a) + np.asarray(b)).reshape(nov, nov)
        occ = np.asarray(mf.mo_occ) > 0
        co = np.asarray(mf.mo_coeff)[:, occ]
        cv = np.asarray(mf.mo_coeff)[:, ~occ]
        r_ints = np.asarray(mol.intor('int1e_r'))
        d = np.einsum('xuv,ui,va->xia', r_ints, co, cv).reshape(3, nov)
        u = np.linalg.solve(apb, d.T)            # (nov, 3)
        self.alpha = 4.0 * d @ u
        return self.alpha

    run = kernel


def dynamic_polarizability(mf, omegas):
    """Frequency-dependent alpha(w) from the TDHF/TDDFT excitation
    spectrum (sum over states):

      alpha_xy(w) = sum_n 2 w_n d_n,x d_n,y / (w_n^2 - w^2)

    with d_n the transition dipoles of the full (A, B) response problem.
    At w=0 this equals the static CPHF/CPKS polarizability (oracle in
    tests/test_prop_dynamic.py).
    """
    from ..tdscf.rhf import TDHF
    mol = mf.mol
    occ = np.asarray(mf.mo_occ) > 0
    nov = int(occ.sum()) * int((~occ).sum())
    td = TDHF(mf)
    td.nstates = nov                    # full spectrum (dense Casida)
    e = np.asarray(td.kernel())
    dips = np.asarray(td.transition_dipole())      # (nstates, 3)
    omegas = np.atleast_1d(np.asarray(omegas, dtype=float))
    out = np.zeros((len(omegas), 3, 3))
    for i, w in enumerate(omegas):
        denom = e ** 2 - w ** 2
        out[i] = np.einsum('n,nx,ny->xy', 2.0 * e / denom, dips, dips)
    return out
