"""Unrestricted Kohn-Sham DFT (analog of reference pyscf/dft/uks.py)."""
import jax.numpy as jnp

from ..scf.uhf import UHF
from .rks import KohnShamDFT


class UKS(KohnShamDFT, UHF):
    def __init__(self, mol, xc='lda,vwn'):
        UHF.__init__(self, mol)
        self._init_ks(xc)

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
