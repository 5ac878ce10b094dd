"""k-point direct-RPA correlation energy (analog of reference
pyscf/pbc/gw/krpa.py).

E_c = (1/2 pi nk) int dw  sum_q [ ln det(1 + M_q(iw)) - tr M_q(iw) ]

with the symmetrized polarizability in the k-resolved transition basis
(the DF-auxiliary form of the molecular gw/rpa.py is replaced by the
particle-hole space — no periodic DF factor is needed; the Coulomb
blocks come from the same FFT MO-ERI engine as KMP2, pbc/mp/kmp2.py
eri_block):

  M_q[(ki,ia),(kj,jb)] = sqrt(x_ia) 4 (i_ki a_ki+q | b_kj+q j_kj)
                          sqrt(x_jb) / nk,
  x_ia(iw) = d_ia / (w^2 + d_ia^2),  d_ia = e_a(ki+q) - e_i(ki).

The q-block structure is exactly the momentum decomposition of the
supercell dielectric, so a 2-k-mesh run equals the doubled Gamma
supercell per cell (tests/test_krpa.py).
"""
import numpy as np

from ..mp.kmp2 import kconserve_index, _member
from ...gw.rpa import _scaled_legendre


class KRPA:
    nw = 40
    x0 = 0.5

    def __init__(self, mf):
        self._scf = mf
        self.cell = mf.cell
        self.e_corr = None

    def kernel(self):
        mf = self._scf
        cell = self.cell
        kpts = mf.kpts
        nk = len(kpts)
        from ..df.fft import eval_ao_kpts
        mesh = cell.mesh
        ao_k = np.asarray(eval_ao_kpts(cell, mf.with_df.grids_coords,
                                       kpts, 0))

        occ = [np.asarray(o) > 0 for o in mf.mo_occ]
        Co = [np.asarray(mf.mo_coeff[k])[:, occ[k]] for k in range(nk)]
        Cv = [np.asarray(mf.mo_coeff[k])[:, ~occ[k]] for k in range(nk)]
        eo = [np.asarray(mf.mo_energy[k])[occ[k]] for k in range(nk)]
        ev = [np.asarray(mf.mo_energy[k])[~occ[k]] for k in range(nk)]

        from ..mp.kmp2 import eri_block
        # q mesh = differences within the k mesh; map ki -> ki+q
        binv = np.linalg.inv(cell.reciprocal_vectors_)
        kplus = np.zeros((nk, nk), dtype=int)   # kplus[iq, ki] = idx(ki+q)
        for iq in range(nk):
            q = kpts[iq] - kpts[0]
            for ki in range(nk):
                kq = kpts[ki] + q
                frac = kq @ binv
                found = None
                for kk in range(nk):
                    d = (kpts[kk] @ binv) - frac
                    if np.linalg.norm(d - np.round(d)) < 1e-8:
                        found = kk
                        break
                assert found is not None
                kplus[iq, ki] = found

        freqs, wts = _scaled_legendre(self.nw, self.x0)
        e_corr = 0.0
        for iq in range(nk):
            # build V_q over the stacked (ki, i, a) transition space
            sizes = [len(eo[ki]) * len(ev[kplus[iq, ki]])
                     for ki in range(nk)]
            offs = np.concatenate([[0], np.cumsum(sizes)])
            ntot = int(offs[-1])
            V = np.zeros((ntot, ntot), dtype=complex)
            d_all = np.concatenate([
                (ev[kplus[iq, ki]][None, :]
                 - eo[ki][:, None]).ravel() for ki in range(nk)])
            for ki in range(nk):
                ka = kplus[iq, ki]
                for kj in range(nk):
                    kb = kplus[iq, kj]
                    blk = np.asarray(eri_block(
                        cell, ao_k, kpts,
                        Co[ki], ki, Cv[ka], ka,
                        Cv[kb], kb, Co[kj], kj, mesh=mesh))
                    n1 = len(eo[ki]) * len(ev[ka])
                    n2 = len(eo[kj]) * len(ev[kb])
                    # (i a | b j) -> [(ia),(jb)]
                    V[offs[ki]:offs[ki] + n1, offs[kj]:offs[kj] + n2] = \
                        blk.transpose(0, 1, 3, 2).reshape(n1, n2)
            V = 0.5 * (V + V.conj().T)
            for om, wt in zip(freqs, wts):
                x = np.sqrt(4.0 * d_all / (om ** 2 + d_all ** 2) / nk)
                M = (x[:, None] * V * x[None, :])
                w_eig = np.linalg.eigvalsh(M)
                e_corr += wt / (2 * np.pi) * float(
                    np.sum(np.log1p(w_eig) - w_eig)) / nk
        self.e_corr = float(e_corr)
        return self.e_corr

    run = kernel
