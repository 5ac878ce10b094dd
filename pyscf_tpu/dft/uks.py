"""Unrestricted Kohn-Sham DFT (analog of reference pyscf/dft/uks.py)."""
import jax.numpy as jnp

from ..scf.uhf import UHF
from .rks import KohnShamDFT


class UKS(KohnShamDFT, UHF):
    def __init__(self, mol, xc='lda,vwn'):
        UHF.__init__(self, mol)
        self._init_ks(xc)

    def _fused_veff(self):
        if self.grids.coords is None:
            self.grids.build()
        deriv = 1 if self.xc_obj.is_gga else 0
        aod, weights = self._numint.grid_ao(self.mol, self.grids, deriv)
        core = self._numint._get_uks_core_aod(self.mol, self.xc)
        hyb = float(self._numint.hybrid_coeff(self.xc))
        data = {'aod': aod, 'weights': weights}

        def jk_terms(data, dma, dmb, coa, cob):
            if 'B' in data:
                B = data['B']
                rho = jnp.einsum('pkl,lk->p', B, dma + dmb)
                vj = jnp.einsum('p,pij->ij', rho, B)
                if hyb == 0.0:
                    return vj, None, None
                Boa = jnp.einsum('pij,jo->pio', B, coa)
                Bob = jnp.einsum('pij,jo->pio', B, cob)
                vka = jnp.einsum('pio,pjo->ij', Boa, Boa)
                vkb = jnp.einsum('pio,pjo->ij', Bob, Bob)
                return vj, vka, vkb
            eri = data['eri']
            vj = jnp.einsum('ijkl,lk->ij', eri, dma + dmb)
            if hyb == 0.0:
                return vj, None, None
            vka = jnp.einsum('ilkj,lk->ij', eri, dma)
            vkb = jnp.einsum('ilkj,lk->ij', eri, dmb)
            return vj, vka, vkb

        def veff_fn(data, dma, dmb, coa, cob):
            _, exc, vxc = core(data['aod'], data['weights'],
                               jnp.stack([dma, dmb]))
            vj, vka, vkb = jk_terms(data, dma, dmb, coa, cob)
            e2 = 0.5 * jnp.sum(vj * (dma + dmb)) + exc
            vhf = vxc + vj[None]
            if hyb != 0.0:
                vhf = vhf - hyb * jnp.stack([vka, vkb])
                e2 = e2 - 0.5 * hyb * (jnp.sum(vka * dma)
                                       + jnp.sum(vkb * dmb))
            return vhf, e2

        if self.with_df is not None:
            data['B'] = self.with_df.cderi
            key = ('uks-df', self.xc, hyb, data['B'].shape, aod.shape)
        else:
            if self._eri is None:
                self._eri = self.mol.intor('int2e')
            data['eri'] = self._eri
            key = ('uks-eri', self.xc, hyb, data['eri'].shape, aod.shape)
        return key, veff_fn, data

    def get_veff(self, mol=None, dm=None, dm_last=None, vhf_last=None):
        mol = mol or self.mol
        dm = jnp.asarray(dm)
        if self.grids.coords is None:
            self.grids.build()
        n, exc, vxc = self._numint.nr_uks(mol, self.grids, self.xc, dm)
        hyb = self._numint.hybrid_coeff(self.xc)
        if hyb == 0.0:
            vj = self.get_jk(mol, dm, with_k=False)[0]
            vjt = vj[0] + vj[1]
            ecoul = 0.5 * float(jnp.einsum('ij,sji->', vjt, dm))
            vxc = vxc + vjt[None]
            ek = 0.0
        else:
            vj, vk = self.get_jk(mol, dm)
            vjt = vj[0] + vj[1]
            vk = vk * hyb
            ecoul = 0.5 * float(jnp.einsum('ij,sji->', vjt, dm))
            ek = -0.5 * float(jnp.einsum('sij,sji->', vk, dm))
            vxc = vxc + vjt[None] - vk
        self._exc = exc
        self._ecoul = ecoul
        self._ek = ek
        return vxc

    def energy_elec(self, dm, h1e, vhf):
        e1 = float(jnp.einsum('ij,sji->', h1e, dm))
        return e1 + self._ecoul + self._exc + self._ek
