"""Unrestricted MP2 (analog of reference pyscf/mp/ump2.py)."""
import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _emp2_uhf(ovov_aa, ovov_bb, ovov_ab, eia_a, eia_b):
    def same_spin(ovov, eia):
        d = eia[:, :, None, None] + eia[None, None, :, :]
        t2 = ovov / d
        return 0.5 * (jnp.einsum('iajb,iajb->', ovov, t2)
                      - jnp.einsum('iajb,ibja->', ovov, t2))

    e_aa = same_spin(ovov_aa, eia_a)
    e_bb = same_spin(ovov_bb, eia_b)
    d_ab = eia_a[:, :, None, None] + eia_b[None, None, :, :]
    t2_ab = ovov_ab / d_ab
    e_ab = jnp.einsum('iajb,iajb->', ovov_ab, t2_ab)
    return e_aa + e_bb + e_ab, e_ab, e_aa + e_bb


class UMP2:
    def __init__(self, mf, frozen=0):
        self._scf = mf
        self.mol = mf.mol
        self.frozen = frozen or 0
        self.e_corr = None

    @property
    def e_tot(self):
        return float(self.e_corr) + float(self._scf.e_tot)

    def kernel(self):
        mf = self._scf
        from .. import ao2mo
        eri_ao = mf._eri if mf._eri is not None else self.mol.intor('int2e')
        mo_e = np.asarray(mf.mo_energy)
        mo_c = np.asarray(mf.mo_coeff)
        occ = np.asarray(mf.mo_occ) > 0
        eia, cos, cvs = [], [], []
        for s in range(2):
            co = jnp.asarray(mo_c[s][:, occ[s]][:, self.frozen:])
            cv = jnp.asarray(mo_c[s][:, ~occ[s]])
            eo = mo_e[s][occ[s]][self.frozen:]
            ev = mo_e[s][~occ[s]]
            eia.append(jnp.asarray(eo[:, None] - ev[None, :]))
            cos.append(co)
            cvs.append(cv)
        ovov_aa = ao2mo.general(eri_ao, (cos[0], cvs[0], cos[0], cvs[0]))
        ovov_bb = ao2mo.general(eri_ao, (cos[1], cvs[1], cos[1], cvs[1]))
        ovov_ab = ao2mo.general(eri_ao, (cos[0], cvs[0], cos[1], cvs[1]))
        e, e_os, e_ss = _emp2_uhf(ovov_aa, ovov_bb, ovov_ab,
                                  eia[0], eia[1])
        self.e_corr = float(e)
        self.e_corr_os = float(e_os)   # alpha-beta (opposite spin)
        self.e_corr_ss = float(e_ss)   # aa + bb (same spin)
        return self.e_corr, None

    def energy_scs(self, p_os=1.2, p_ss=1.0 / 3.0):
        """SCS-MP2 energy from the os/ss split (Grimme 2003); SOS via
        (1.3, 0). (1, 1) recovers plain UMP2."""
        if self.e_corr is None:
            self.kernel()
        return p_os * self.e_corr_os + p_ss * self.e_corr_ss

    run = kernel
