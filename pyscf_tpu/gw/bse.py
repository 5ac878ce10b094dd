"""Bethe-Salpeter equation on top of GW quasiparticle energies.

Reference analog: pyscf/gw/bse.py (bse_full_diagonalization:49,
_get_lpq_bar:1473). Statically screened W in the DF auxiliary basis:

  Pi0 = 4 sum_ia L_ia L_ia / (e_i - e_a)   (restricted)
  Lbar = (1 - Pi0)^-1 L
  A+B  = D + 4 (ia|jb)[singlet] - [W_A + W_B],  A-B = D - [W_A - W_B]
  W_A  = sum_P L_ij Lbar_ab,  W_B = sum_P L_ib Lbar_aj

solved as (A+B)(A-B)|X+Y> = w^2 |X+Y> (dense generalized eigh, MXU).
All energies are GW QP values. Golden: H2O/def2-SVP PBE BSE@G0W0
singlet 0.25749397, triplet 0.22299263 (reference gw/test/test_bse.py).
"""
import numpy as np
import scipy.linalg


class BSE:
    def __init__(self, gw):
        self.gw = gw
        self.mol = gw.mol
        self.mo_energy = np.asarray(gw.mo_energy)
        self.nocc = int(gw.nocc)
        self.Lpq = np.asarray(gw.Lpq)
        self.exci = None
        self.xy = None

    def kernel(self, multi='s', nroots=None, tda=False):
        e = self.mo_energy
        no = self.nocc
        L = self.Lpq
        naux, nmo, _ = L.shape
        nv = nmo - no
        dim = no * nv
        Lov = L[:, :no, no:]
        d_ia = 1.0 / (e[:no, None] - e[None, no:])
        pi0 = 4.0 * np.einsum('Pia,ia,Qia->PQ', Lov, d_ia, Lov)
        lbar = np.linalg.solve(np.eye(naux) - pi0, L.reshape(naux, -1))
        lbar = lbar.reshape(naux, nmo, nmo)

        wa = np.einsum('Pij,Pab->iajb', L[:, :no, :no],
                       lbar[:, no:, no:]).reshape(dim, dim)
        wb = np.einsum('Pib,Paj->iajb', Lov,
                       lbar[:, no:, :no]).reshape(dim, dim)
        dvec = (e[None, no:] - e[:no, None]).reshape(-1)
        coul = 0.0
        if multi == 's':
            coul = np.einsum('Pia,Pjb->iajb', Lov, Lov).reshape(dim, dim)
        if tda:
            a = np.diag(dvec) - wa + (2.0 * coul if multi == 's' else 0.0)
            exci, x = np.linalg.eigh(0.5 * (a + a.T))
            self.xy = [(x[:, i].reshape(no, nv), 0) for i in range(len(exci))]
        else:
            apb = np.diag(dvec) - wa - wb + (4.0 * coul
                                             if multi == 's' else 0.0)
            amb = np.diag(dvec) - wa + wb
            w2, xpy_w = scipy.linalg.eigh(apb, amb, type=3)
            exci = np.sqrt(np.clip(w2, 0.0, None))
            self.xy = None
        if nroots is not None:
            exci = exci[:nroots]
        self.exci = exci
        return exci, self.xy
