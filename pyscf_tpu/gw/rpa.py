"""Direct RPA correlation energy (particle-hole, DF), analog of reference
pyscf/gw/rpa.py. E_c = 1/(2pi) int dw [ln det(1 - Pi(iw)) + tr Pi(iw)],
evaluated with scaled Gauss-Legendre quadrature; the dielectric build is a
dense MXU matmul over the DF (ov|P) factor.
"""
import numpy as np
import jax
import jax.numpy as jnp


def _scaled_legendre(nw, x0=0.5):
    x, w = np.polynomial.legendre.leggauss(nw)
    freqs = x0 * (1.0 + x) / (1.0 - x)
    wts = w * 2.0 * x0 / (1.0 - x) ** 2
    return freqs, wts


@jax.jit
def _diel(Bov, chi0):
    return jnp.einsum('pk,k,qk->pq', Bov, chi0, Bov)


class RPA:
    nw = 40
    x0 = 0.5

    def __init__(self, mf, frozen=0, auxbasis=None):
        self._scf = mf
        self.mol = mf.mol
        self.frozen = frozen or 0
        self.auxbasis = auxbasis
        self.e_corr = None
        self.e_hf = None

    @property
    def e_tot(self):
        return self.e_hf + self.e_corr

    def get_e_hf(self):
        """Exact-exchange (HF) energy of the reference determinant."""
        mf = self._scf
        dm = mf.make_rdm1()
        h1 = mf.get_hcore()
        if getattr(mf, 'with_df', None) is not None:
            vj, vk = mf.with_df.get_jk(dm)
        else:
            from ..scf.hf import dot_eri_dm
            eri = mf._eri if mf._eri is not None else self.mol.intor('int2e')
            vj, vk = dot_eri_dm(eri, jnp.asarray(dm))
        e = (jnp.einsum('ij,ji->', h1, dm)
             + 0.5 * jnp.einsum('ij,ji->', vj, dm)
             - 0.25 * jnp.einsum('ij,ji->', vk, dm))
        return float(e) + self.mol.energy_nuc()

    def kernel(self):
        mf = self._scf
        from ..df import DF
        from ..df.df_jk import _bmo
        df = getattr(mf, 'with_df', None)
        if df is None:
            df = DF(self.mol, self.auxbasis).build()
        occ = np.asarray(mf.mo_occ) > 0
        co = mf.mo_coeff[:, occ][:, self.frozen:]
        cv = mf.mo_coeff[:, ~occ]
        mo_e = np.asarray(mf.mo_energy)
        eo = mo_e[occ][self.frozen:]
        ev = mo_e[~occ]
        e_ov = (ev[None, :] - eo[:, None]).ravel()      # positive gaps
        Bov = _bmo(df.cderi, jnp.asarray(co), jnp.asarray(cv))
        naux = Bov.shape[0]
        Bov = Bov.reshape(naux, -1)
        freqs, wts = _scaled_legendre(self.nw, self.x0)
        e_corr = 0.0
        for om, wt in zip(freqs, wts):
            # Pi(iw) = -4 sum_ia B e_ia/(w^2+e_ia^2) B  (negative definite)
            chi0 = jnp.asarray(4.0 * e_ov / (om ** 2 + e_ov ** 2))
            D = np.asarray(_diel(Bov, chi0))
            sign, logdet = np.linalg.slogdet(np.eye(naux) + D)
            e_corr += wt / (2 * np.pi) * (logdet - np.trace(D))
        self.e_hf = self.get_e_hf()
        self.e_corr = float(e_corr)
        return self.e_corr

    run = kernel


dRPA = RPA
