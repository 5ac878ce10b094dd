"""k-point restricted Kohn-Sham (analog of reference pbc/dft/krks.py).

XC is integrated on the uniform FFT grid from the k-summed density; J
from KFFTDF; hybrid exchange reuses the KRHF FFT-K with the Ewald
probe-charge correction.
"""
import numpy as np

from ..scf.khf import KRHF
from ...dft import xc as xc_mod


class KRKS(KRHF):
    def __init__(self, cell, kpts=None, xc='lda,vwn', exxdiv='ewald'):
        super().__init__(cell, kpts, exxdiv=exxdiv)
        self.xc = xc

    def get_veff(self, dm_kpts):
        cell = self.cell
        df = self.with_df
        xc = xc_mod.parse_xc(self.xc)
        omega, alpha, hyb = (xc.rsh[0], xc.rsh[1], xc.hyb)
        if omega:
            raise NotImplementedError('RSH functionals with k-points')
        w = df.weight
        nk = self.nkpts
        ao_k = df._ao_on_grid_kpts()
        dm = np.asarray(dm_kpts)
        ngrid = ao_k.shape[1]
        rho = np.zeros(ngrid)
        if xc.is_gga:
            aod_k = eval_ao = None
            from ..df.fft import eval_ao_kpts
            aod_k = eval_ao_kpts(cell, df.grids_coords, self.kpts, 1)
            grho = np.zeros((3, ngrid))
            for k in range(nk):
                dmao = aod_k[k, 0] @ dm[k]
                rho += np.einsum('gi,gi->g', dmao,
                                 aod_k[k, 0].conj()).real
                grho += 2.0 * np.einsum('gi,dgi->dg', dmao,
                                        aod_k[k, 1:].conj()).real
            rho = np.maximum(rho / nk, 0.0)
            grho /= nk
            sigma = np.einsum('dg,dg->g', grho, grho)
        else:
            for k in range(nk):
                dmao = ao_k[k] @ dm[k]
                rho += np.einsum('gi,gi->g', dmao, ao_k[k].conj()).real
            rho = np.maximum(rho / nk, 0.0)
            sigma = np.zeros_like(rho)
            grho = None

        import jax
        import jax.numpy as jnp
        from ...dft.numint import _masked

        def edens(r, s):
            return xc.exc_density(0.5 * r, 0.5 * r, 0.25 * s, 0.25 * s,
                                  0.25 * s)

        mask, rho_s, sigma_s = _masked(jnp.asarray(rho), jnp.asarray(sigma))
        e_dens = np.where(np.asarray(mask),
                          np.asarray(edens(rho_s, sigma_s)), 0.0)
        exc = w * e_dens.sum()
        g = jax.grad(lambda r, s: jnp.sum(edens(r, s)), argnums=(0, 1))
        vrho, vsigma = g(rho_s, sigma_s)
        vrho = np.where(np.asarray(mask), np.asarray(vrho), 0.0)
        vsigma = np.where(np.asarray(mask), np.asarray(vsigma), 0.0)

        vj, vk = (None, None)
        if hyb != 0.0:
            vj, vk = self.get_jk(dm)
            vk = hyb * vk
        else:
            vj, _ = self.get_jk(dm, with_k=False)
        nao = cell.nao
        vxc = np.zeros((nk, nao, nao), dtype=complex)
        for k in range(nk):
            if xc.is_gga:
                from ..df.fft import eval_ao_kpts as _e
                aod = aod_k[k]
                ao = aod[0]
                vtmp = 0.5 * (w * vrho)[:, None] * ao \
                    + 2.0 * np.einsum('g,dg,dgi->gi', w * vsigma, grho,
                                      aod[1:])
                vxc[k] = ao.conj().T @ vtmp
                vxc[k] = vxc[k] + vxc[k].conj().T
            else:
                vxc[k] = np.einsum('gi,g,gj->ij', ao_k[k].conj(),
                                   w * vrho, ao_k[k])
        self._exc = float(exc)
        ecoul = 0.5 * np.einsum('kij,kji->', vj, dm).real / nk
        self._ecoul = ecoul
        if vk is not None:
            self._ek = -0.25 * np.einsum('kij,kji->', vk, dm).real / nk
            return vj + vxc - 0.5 * vk
        self._ek = 0.0
        return vj + vxc

    def energy_elec(self, dm, h1e, vhf):
        e1 = np.einsum('kij,kji->', h1e, dm).real / self.nkpts
        return e1 + self._ecoul + self._exc + self._ek
