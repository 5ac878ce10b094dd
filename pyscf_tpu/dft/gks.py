"""Generalized Kohn-Sham DFT, collinear XC (analog of reference
pyscf/dft/gks.py + the collinear branch of dft/numint2c.py).

The spinor density (2nao x 2nao) may mix spin blocks through the
exchange term, but the collinear XC functional sees only the diagonal
spin blocks: rho_a = D_aa, rho_b = D_bb, evaluated with the same
spin-resolved numint core as UKS; vxc enters only those blocks.
(Noncollinear/multi-collinear treatments, numint2c.py mcol branch,
are not implemented.)
"""
import jax.numpy as jnp

from ..scf.ghf import GHF
from .rks import KohnShamDFT


class GKS(KohnShamDFT, GHF):

    _fused_kind = None      # host loop (general spinor occupations)

    def __init__(self, mol, xc='lda,vwn'):
        GHF.__init__(self, mol)
        self._init_ks(xc)

    def get_veff(self, mol=None, dm=None, dm_last=None, vhf_last=None):
        mol = mol or self.mol
        dm = jnp.asarray(dm)
        nao = dm.shape[-1] // 2
        dmaa = dm[:nao, :nao]
        dmbb = dm[nao:, nao:]
        if self.grids.coords is None:
            self.grids.build()
        dms = jnp.stack([dmaa.real, dmbb.real])
        n, exc, vxc = self._numint.nr_uks(mol, self.grids, self.xc, dms)
        if getattr(self, 'nlc', ''):
            from .vv10 import nr_vv10
            e_nlc, v_nlc = nr_vv10(mol, self.grids, dms[0] + dms[1],
                                   b=getattr(self, 'nlc_b', 5.9),
                                   C=getattr(self, 'nlc_C', 0.0093))
            exc = exc + e_nlc
            vxc = vxc + v_nlc[None, :, :]
        omega, alpha, hyb = self._numint.rsh_and_hybrid_coeff(self.xc)
        if hyb == 0.0 and not omega:
            vj = self.get_jk(mol, dm, with_k=False)[0]
            vk = None
            ek = 0.0
        else:
            vj, vk = self.get_jk(mol, dm)
            vk = vk * hyb
            if omega:
                vk = vk + (alpha - hyb) * self.get_jk(
                    mol, dm, with_j=False, omega=omega)[1]
            ek = -0.5 * float(jnp.einsum('ij,ji->', vk, dm).real)
        ecoul = 0.5 * float(jnp.einsum('ij,ji->', vj, dm).real)
        vxc_g = jnp.zeros_like(vj)
        vxc_g = vxc_g.at[:nao, :nao].set(vxc[0])
        vxc_g = vxc_g.at[nao:, nao:].set(vxc[1])
        vhf = vj + vxc_g
        if vk is not None:
            vhf = vhf - vk
        self._exc = float(exc)
        self._ecoul = ecoul
        self._ek = ek
        return vhf

    def energy_elec(self, dm, h1e, vhf):
        e1 = float(jnp.einsum('ij,ji->', h1e, dm).real)
        return e1 + self._ecoul + self._exc + self._ek
