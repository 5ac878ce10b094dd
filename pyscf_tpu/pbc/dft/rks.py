"""Gamma-point periodic Kohn-Sham DFT (analog of reference
pyscf/pbc/dft/rks.py + periodic numint on the uniform grid)."""
import numpy as np
import jax.numpy as jnp

from ..scf.hf import RHF as PBCRHF
from ...dft import xc as xc_mod


class RKS(PBCRHF):
    def __init__(self, cell, xc='lda,vwn'):
        super().__init__(cell, exxdiv='ewald')
        self.xc = xc
        self._exc = 0.0

    def multigrid_fftdf_(self, nlevels=3):
        """Switch the J/XC quadrature to the GPW multigrid engine
        (pbc/dft/multigrid.py; reference analog
        pyscf/pbc/dft/multigrid/multigrid.py:1069 nr_rks)."""
        from .multigrid import MultiGridFFTDF
        self.with_df = MultiGridFFTDF(self.cell, nlevels=nlevels)
        return self

    def get_veff(self, mol=None, dm=None, dm_last=None, vhf_last=None):
        cell = self.cell
        df = self.with_df
        xc = xc_mod.parse_xc(self.xc)
        hyb = xc.hyb
        from .multigrid import MultiGridFFTDF
        if isinstance(df, MultiGridFFTDF) and hyb == 0.0:
            vhf, ej, exc = df.get_veff_rks(dm, xc)
            self._exc = exc
            self._ecoul = ej
            self._ek = 0.0
            return vhf
        w = df.weight
        dm_np = np.asarray(dm)
        if xc.is_gga:
            aod = np.asarray(df._ao_on_grid(1))
            ao = aod[0]
            dmao = ao @ dm_np
            rho = np.maximum(np.einsum('gi,gi->g', dmao, ao), 0.0)
            grho = 2.0 * np.einsum('gi,dgi->dg', dmao, aod[1:])
            sigma = np.einsum('dg,dg->g', grho, grho)
        else:
            ao = np.asarray(df._ao_on_grid(0))
            dmao = ao @ dm_np
            rho = np.maximum(np.einsum('gi,gi->g', dmao, ao), 0.0)
            sigma = np.zeros_like(rho)
        # energy density + derivatives via autodiff (same as molecular numint)
        import jax

        def edens(r, s):
            return xc.exc_density(0.5 * r, 0.5 * r, 0.25 * s, 0.25 * s,
                                  0.25 * s)

        mask = rho > 1e-12
        rho_s = np.where(mask, rho, 1.0)
        sigma_s = np.where(mask, sigma, 1.0)
        grad_fn = jax.grad(lambda r, s: jnp.sum(edens(r, s)), argnums=(0, 1))
        vrho, vsigma = grad_fn(jnp.asarray(rho_s), jnp.asarray(sigma_s))
        vrho = np.where(mask, np.asarray(vrho), 0.0)
        vsigma = np.where(mask, np.asarray(vsigma), 0.0)
        exc = float(np.sum(np.where(mask, w * np.asarray(
            edens(jnp.asarray(rho_s), jnp.asarray(sigma_s))), 0.0)))
        vxc = w * np.einsum('gi,g,gj->ij', ao, 0.5 * vrho, ao)
        if xc.is_gga:
            vtmp = 2.0 * np.einsum('g,dg,dgi->gi', w * vsigma, grho, aod[1:])
            vxc = vxc + 0.5 * (ao.T @ vtmp)
        vxc = vxc + vxc.T
        if hyb == 0.0:
            vj, _ = df.get_jk(dm_np, with_k=False)
            vj = np.asarray(vj)
            ecoul = 0.5 * float(np.einsum('ij,ji->', vj, dm_np))
            vout = jnp.asarray(vxc + vj)
            ek = 0.0
        else:
            vj, vk = self.get_jk(cell, dm_np)
            vj, vk = np.asarray(vj), np.asarray(vk) * hyb
            ecoul = 0.5 * float(np.einsum('ij,ji->', vj, dm_np))
            ek = -0.25 * float(np.einsum('ij,ji->', vk, dm_np))
            vout = jnp.asarray(vxc + vj - 0.5 * vk)
        self._exc = exc
        self._ecoul = ecoul
        self._ek = ek
        return vout

    def energy_elec(self, dm, h1e, vhf):
        e1 = float(jnp.einsum('ij,ji->', h1e, jnp.asarray(dm)))
        return e1 + self._ecoul + self._exc + self._ek
