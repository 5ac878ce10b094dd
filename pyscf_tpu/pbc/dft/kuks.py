"""k-point unrestricted Kohn-Sham (analog of reference pbc/dft/kuks.py).

Spin-resolved densities on the uniform FFT grid; the XC potential per
spin channel is jax.grad of the spin-resolved energy density (same
autodiff pattern as the molecular UKS). Closed-shell KUKS == KRKS is the
consistency oracle (tests/test_pbc_extras.py).
"""
import numpy as np
import jax
import jax.numpy as jnp

from ...dft import xc as xc_mod
from ...dft.numint import RHO_THR
from ..scf.kuhf import KUHF


class KUKS(KUHF):
    def __init__(self, cell, kpts=None, xc='lda,vwn', exxdiv='ewald'):
        super().__init__(cell, kpts, exxdiv=exxdiv)
        self.xc = xc

    def get_veff(self, dm_kpts):
        cell = self.cell
        df = self.with_df
        xc = xc_mod.parse_xc(self.xc)
        if xc.rsh[0]:
            raise NotImplementedError('RSH functionals with k-points')
        hyb = xc.hyb
        w = df.weight
        nk = self.nkpts
        dm = np.asarray(dm_kpts)                 # (2, nk, nao, nao)
        ngrid = np.prod(df.mesh)
        gga = xc.is_gga

        if gga:
            from ..df.fft import eval_ao_kpts
            aod_k = eval_ao_kpts(cell, df.grids_coords, self.kpts, 1)
        else:
            ao_k = df._ao_on_grid_kpts()
        rhos = []
        grhos = []
        for s in range(2):
            r = np.zeros(ngrid)
            g = np.zeros((3, ngrid))
            for k in range(nk):
                if gga:
                    dmao = aod_k[k, 0] @ dm[s][k]
                    r += np.einsum('gi,gi->g', dmao,
                                   aod_k[k, 0].conj()).real
                    g += 2.0 * np.einsum('gi,dgi->dg', dmao,
                                         aod_k[k, 1:].conj()).real
                else:
                    dmao = ao_k[k] @ dm[s][k]
                    r += np.einsum('gi,gi->g', dmao, ao_k[k].conj()).real
            rhos.append(np.maximum(r / nk, 0.0))
            grhos.append(g / nk)
        saa = np.einsum('dg,dg->g', grhos[0], grhos[0])
        sab = np.einsum('dg,dg->g', grhos[0], grhos[1])
        sbb = np.einsum('dg,dg->g', grhos[1], grhos[1])

        mask = (rhos[0] + rhos[1]) > RHO_THR
        ra = jnp.where(mask, rhos[0], 0.5)
        rb = jnp.where(mask, rhos[1], 0.5)
        saa_j = jnp.where(mask, saa, 0.0)
        sab_j = jnp.where(mask, sab, 0.0)
        sbb_j = jnp.where(mask, sbb, 0.0)

        def edens(a, b, xaa, xab, xbb):
            return xc.exc_density(a, b, xaa, xab, xbb)

        e_dens = np.where(mask, np.asarray(edens(ra, rb, saa_j, sab_j,
                                                 sbb_j)), 0.0)
        exc = w * e_dens.sum()
        grads = jax.grad(lambda *a: jnp.sum(edens(*a)),
                         argnums=(0, 1, 2, 3, 4))(ra, rb, saa_j, sab_j,
                                                  sbb_j)
        vra, vrb, vsaa, vsab, vsbb = [
            np.where(mask, np.asarray(x), 0.0) for x in grads]

        vj, vk = self.get_jk(dm) if hyb != 0.0 else (
            self.get_jk(dm, with_k=False)[0], None)
        if vk is not None:
            vk = hyb * vk
        nao = cell.nao
        vxc = np.zeros((2, nk, nao, nao), dtype=complex)
        for s in range(2):
            vr = vra if s == 0 else vrb
            if gga:
                gsame = grhos[0] if s == 0 else grhos[1]
                gother = grhos[1] if s == 0 else grhos[0]
                vs_same = vsaa if s == 0 else vsbb
                wgrad = (2.0 * vs_same[None, :] * gsame
                         + vsab[None, :] * gother)
                for k in range(nk):
                    aod = aod_k[k]
                    ao = aod[0]
                    vtmp = 0.5 * (w * vr)[:, None] * ao \
                        + np.einsum('dg,dgi->gi', w * wgrad, aod[1:])
                    m = ao.conj().T @ vtmp
                    vxc[s][k] = m + m.conj().T
            else:
                for k in range(nk):
                    ao = ao_k[k]
                    vxc[s][k] = np.einsum('gi,g,gj->ij', ao.conj(),
                                          w * vr, ao)
        self._exc = float(exc)
        self._ecoul = 0.5 * np.einsum('skij,kji->', vj,
                                      dm[0] + dm[1]).real / nk / 2
        out = vj + vxc
        if vk is not None:
            self._ek = -0.5 * np.einsum('skij,skji->', vk, dm).real / nk
            out = out - vk
        else:
            self._ek = 0.0
        return out

    def energy_elec(self, dm, h1e, vhf):
        e1 = np.einsum('kij,skji->', h1e, dm).real / self.nkpts
        return e1 + self._ecoul + self._exc + self._ek
