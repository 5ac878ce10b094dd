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
        omega, alpha, hyb = self._numint.rsh_and_hybrid_coeff(self.xc)
        data = {'aod': aod, 'weights': weights}
        with_k = hyb != 0.0 or bool(omega)

        def jk_terms(data, dma, dmb, coa, cob):
            if 'B' in data:
                B = data['B']
                rho = jnp.einsum('pkl,lk->p', B, dma + dmb)
                vj = jnp.einsum('p,pij->ij', rho, B)
                if not with_k:
                    return vj, None, None

                def kmat(Bx, co):
                    Bo = jnp.einsum('pij,jo->pio', Bx, co)
                    return jnp.einsum('pio,pjo->ij', Bo, Bo)

                vka = hyb * kmat(B, coa)
                vkb = hyb * kmat(B, cob)
                if omega:
                    Blr = data['Blr']
                    vka = vka + (alpha - hyb) * kmat(Blr, coa)
                    vkb = vkb + (alpha - hyb) * kmat(Blr, cob)
                return vj, vka, vkb
            eri = data['eri']
            vj = jnp.einsum('ijkl,lk->ij', eri, dma + dmb)
            if not with_k:
                return vj, None, None
            vka = hyb * jnp.einsum('ilkj,lk->ij', eri, dma)
            vkb = hyb * jnp.einsum('ilkj,lk->ij', eri, dmb)
            if omega:
                lr = data['eri_lr']
                vka = vka + (alpha - hyb) * jnp.einsum('ilkj,lk->ij', lr, dma)
                vkb = vkb + (alpha - hyb) * jnp.einsum('ilkj,lk->ij', lr, dmb)
            return vj, vka, vkb

        def veff_fn(data, dma, dmb, coa, cob):
            _, exc, vxc = core(data['aod'], data['weights'],
                               jnp.stack([dma, dmb]))
            vj, vka, vkb = jk_terms(data, dma, dmb, coa, cob)
            e2 = 0.5 * jnp.sum(vj * (dma + dmb)) + exc
            vhf = vxc + vj[None]
            if with_k:
                vhf = vhf - jnp.stack([vka, vkb])
                e2 = e2 - 0.5 * (jnp.sum(vka * dma) + jnp.sum(vkb * dmb))
            return vhf, e2

        def veff_dm_fn(data, dma, dmb):
            _, exc, vxc = core(data['aod'], data['weights'],
                               jnp.stack([dma, dmb]))
            if 'B' in data:
                B = data['B']
                rho = jnp.einsum('pkl,lk->p', B, dma + dmb)
                vj = jnp.einsum('p,pij->ij', rho, B)
                vka = jnp.einsum('pil,lk,pkj->ij', B, dma, B)
                vkb = jnp.einsum('pil,lk,pkj->ij', B, dmb, B)
                if omega:
                    Blr = data['Blr']
                    vka = hyb * vka + (alpha - hyb) * jnp.einsum(
                        'pil,lk,pkj->ij', Blr, dma, Blr)
                    vkb = hyb * vkb + (alpha - hyb) * jnp.einsum(
                        'pil,lk,pkj->ij', Blr, dmb, Blr)
                else:
                    vka = hyb * vka
                    vkb = hyb * vkb
            else:
                eri = data['eri']
                rhoj = jnp.einsum('ijkl,lk->ij', eri, dma + dmb)
                vj = rhoj
                vka = hyb * jnp.einsum('ilkj,lk->ij', eri, dma)
                vkb = hyb * jnp.einsum('ilkj,lk->ij', eri, dmb)
                if omega:
                    lr = data['eri_lr']
                    vka = vka + (alpha - hyb) * jnp.einsum('ilkj,lk->ij',
                                                           lr, dma)
                    vkb = vkb + (alpha - hyb) * jnp.einsum('ilkj,lk->ij',
                                                           lr, dmb)
            vhf = vxc + vj[None]
            e2 = 0.5 * jnp.sum(vj * (dma + dmb)) + exc
            if with_k:
                vhf = vhf - jnp.stack([vka, vkb])
                e2 = e2 - 0.5 * (jnp.sum(vka * dma) + jnp.sum(vkb * dmb))
            return vhf, e2

        if self.with_df is not None:
            data['B'] = self.with_df.cderi
            if omega:
                data['Blr'] = self._df_lr(omega).cderi
            key = ('uks-df', self.xc, hyb, omega, data['B'].shape, aod.shape)
        else:
            data['eri'] = self._get_eri()
            if omega:
                data['eri_lr'] = self._get_eri(omega)
            key = ('uks-eri', self.xc, hyb, omega, data['eri'].shape,
                   aod.shape)
        return key, veff_fn, data, veff_dm_fn

    def get_veff(self, mol=None, dm=None, dm_last=None, vhf_last=None):
        mol = mol or self.mol
        dm = jnp.asarray(dm)
        if self.grids.coords is None:
            self.grids.build()
        n, exc, vxc = self._numint.nr_uks(mol, self.grids, self.xc, dm)
        if getattr(self, 'nlc', ''):
            from .vv10 import nr_vv10
            # VV10 is evaluated on the total (spin-summed) density
            e_nlc, v_nlc = nr_vv10(mol, self.grids, dm[0] + dm[1],
                                   b=getattr(self, 'nlc_b', 5.9),
                                   C=getattr(self, 'nlc_C', 0.0093))
            exc = exc + e_nlc
            vxc = vxc + v_nlc[None, :, :]
        omega, alpha, hyb = self._numint.rsh_and_hybrid_coeff(self.xc)
        if hyb == 0.0 and not omega:
            vj = self.get_jk(mol, dm, with_k=False)[0]
            vjt = vj[0] + vj[1]
            ecoul = 0.5 * float(jnp.einsum('ij,sji->', vjt, dm))
            vxc = vxc + vjt[None]
            ek = 0.0
        else:
            vj, vk = self.get_jk(mol, dm)
            vjt = vj[0] + vj[1]
            vk = vk * hyb
            if omega:
                vk = vk + (alpha - hyb) * self.get_jk(
                    mol, dm, with_j=False, omega=omega)[1]
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
