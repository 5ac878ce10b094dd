"""Restricted Kohn-Sham DFT (analog of reference pyscf/dft/rks.py:547 RKS,
get_veff:37)."""
import jax.numpy as jnp

from ..lib import logger
from ..scf.hf import RHF, SCF
from . import gen_grid
from . import xc as xc_mod
from .numint import NumInt


class KohnShamDFT:
    """Mixin adding grids/xc machinery to an SCF class."""

    def _init_ks(self, xc='lda,vwn'):
        self.xc = xc
        self.grids = gen_grid.Grids(self.mol)
        self._numint = NumInt()
        self._exc = 0.0

    @property
    def xc(self):
        return self._xc

    @xc.setter
    def xc(self, value):
        # re-resolve built-in nonlocal correlation on every assignment so the
        # reference-style pattern `mf = RKS(mol); mf.xc = 'wb97x-v'` turns
        # VV10 on (and switching away turns it back off) — see
        # pyscf/dft/rks.py KohnShamDFT.xc / numint NLC handling.
        self._xc = value
        nlc = getattr(xc_mod.parse_xc(value), 'nlc', None)
        if nlc is not None:
            self.nlc, self.nlc_b, self.nlc_C = nlc
        else:
            self.nlc = ''

    @property
    def xc_obj(self):
        return xc_mod.parse_xc(self.xc)

    def kernel(self, dm0=None, **kwargs):
        """SCF, plus the PT2 tail for double hybrids (B2PLYP family):
        e_tot = E_SCF[semilocal+hybrid part] + c_os*E_os + c_ss*E_ss with
        the MP2 pair energies on the converged KS orbitals. The reference
        composes this by hand (libxc hybrid part + scaled mp.MP2); here
        ``RKS(mol, xc='b2plyp')`` is complete."""
        e_scf = super().kernel(dm0, **kwargs)
        pt2 = self.xc_obj.pt2
        if pt2 is None:
            return e_scf
        self.e_scf = e_scf
        c_os, c_ss = pt2
        from .. import mp
        kind = getattr(self, '_fused_kind', None)
        if kind not in ('restricted', 'unrestricted'):
            raise NotImplementedError(
                'double-hybrid PT2 tail only for RKS/UKS references')
        pt = (mp.UMP2(self) if kind == 'unrestricted' else mp.MP2(self))
        pt.verbose = 0
        pt.kernel()
        self.e_pt2 = float(pt.energy_scs(p_os=c_os, p_ss=c_ss))
        self.e_tot = e_scf + self.e_pt2
        logger.new_logger(self).note(
            'double hybrid: E_SCF= %.14f  E_PT2= %.14f  E= %.14f',
            e_scf, self.e_pt2, self.e_tot)
        return self.e_tot


class RKS(KohnShamDFT, RHF):
    def __init__(self, mol, xc='lda,vwn'):
        RHF.__init__(self, mol)
        self._init_ks(xc)

    def _fused_veff(self):
        if self.grids.coords is None:
            self.grids.build()
        xc_obj = self.xc_obj
        deriv = 1 if xc_obj.is_gga else 0
        aod, weights = self._numint.grid_ao(self.mol, self.grids, deriv)
        core = self._numint._get_rks_core_aod(self.mol, self.xc)
        omega, alpha, hyb = self._numint.rsh_and_hybrid_coeff(self.xc)
        data = {'aod': aod, 'weights': weights}
        mesh = getattr(self, 'mesh', None)
        if self.with_df is not None and mesh is not None:
            # multi-chip fused Fock: grid blocks and the DF aux axis are
            # sharded over the mesh; XC/J/K partials psum over ICI.
            # TPU-native replacement for the reference's MPI distribution
            # (pyscf/pbc/mpitools/mpi.py).
            from ..parallel.mesh import (shard_put, df_jk_sharded,
                                         xc_core_sharded)
            data['aod'] = shard_put(aod, mesh, 0)
            data['weights'] = shard_put(weights, mesh, 0)
            data['B'] = shard_put(self.with_df.cderi, mesh, 0)
            if omega:
                data['Blr'] = shard_put(self._df_lr(omega).cderi, mesh, 0)
            xc_run = xc_core_sharded(mesh, core, gga=(deriv == 1))
            jk_occ = df_jk_sharded(mesh, with_k_occ=True)
            jk_dm = df_jk_sharded(mesh, with_k_occ=False)

            def _veff(data, dm, co, jk):
                n, exc, vxc = xc_run(data['aod'], data['weights'], dm)
                vj, vk_full = jk(data['B'], dm, dm if co is None else co)
                e2 = 0.5 * jnp.sum(vj * dm) + exc
                vhf = vxc + vj
                if hyb != 0.0 or omega:
                    vk = hyb * vk_full
                    if omega:
                        vk = vk + (alpha - hyb) * jk(
                            data['Blr'], dm, dm if co is None else co)[1]
                    vhf = vhf - 0.5 * vk
                    e2 = e2 - 0.25 * jnp.sum(vk * dm)
                return vhf, e2

            def veff_fn(data, dm, co):
                return _veff(data, dm, co, jk_occ)

            def veff_dm_fn(data, dm):
                return _veff(data, dm, None, jk_dm)

            key = ('rks-df-mesh', self.xc, hyb, omega, data['B'].shape,
                   data['aod'].shape, mesh.devices.size)
            return key, veff_fn, data, veff_dm_fn
        if self.with_df is not None:
            from ..df.df_jk import DF_CHUNK_ELEMS, jk_chunked
            if self.with_df.cderi.size > DF_CHUNK_ELEMS:
                # large system: stream aux slices of the uncopied B
                data['B'] = self.with_df.cderi
                if omega:
                    data['Blr'] = self._df_lr(omega).cderi

                def _veff_c(data, dm, co):
                    _, exc, vxc = core(data['aod'], data['weights'], dm)
                    vj, vk_full = jk_chunked(data['B'], dm, co)
                    e2 = 0.5 * jnp.sum(vj * dm) + exc
                    vhf = vxc + vj
                    if hyb != 0.0 or omega:
                        vk = hyb * vk_full
                        if omega:
                            vk = vk + (alpha - hyb) * jk_chunked(
                                data['Blr'], dm, co)[1]
                        vhf = vhf - 0.5 * vk
                        e2 = e2 - 0.25 * jnp.sum(vk * dm)
                    return vhf, e2

                def veff_fn(data, dm, co):
                    return _veff_c(data, dm, co)

                def veff_dm_fn(data, dm):
                    return _veff_c(data, dm, None)

                key = ('rks-df-chunked', self.xc, hyb, omega,
                       data['B'].shape, aod.shape)
                return key, veff_fn, data, veff_dm_fn
            data['B'] = self.with_df.cderi
            if omega:
                data['Blr'] = self._df_lr(omega).cderi

            def veff_fn(data, dm, co):
                _, exc, vxc = core(data['aod'], data['weights'], dm)
                B = data['B']
                rho = jnp.einsum('pkl,lk->p', B, dm)
                vj = jnp.einsum('p,pij->ij', rho, B)
                e2 = 0.5 * jnp.sum(vj * dm) + exc
                vhf = vxc + vj

                def kmat(Bx):
                    Bo = jnp.einsum('pij,jo->pio', Bx, co)
                    return jnp.einsum('pio,pjo->ij', Bo, Bo)

                if hyb != 0.0 or omega:
                    vk = hyb * kmat(B)
                    if omega:
                        vk = vk + (alpha - hyb) * kmat(data['Blr'])
                    vhf = vhf - 0.5 * vk
                    e2 = e2 - 0.25 * jnp.sum(vk * dm)
                return vhf, e2

            def veff_dm_fn(data, dm):
                _, exc, vxc = core(data['aod'], data['weights'], dm)
                B = data['B']
                rho = jnp.einsum('pkl,lk->p', B, dm)
                vj = jnp.einsum('p,pij->ij', rho, B)
                e2 = 0.5 * jnp.sum(vj * dm) + exc
                vhf = vxc + vj

                def kmat_dm(Bx):
                    Bd = jnp.einsum('pil,lk->pik', Bx, dm)
                    return jnp.einsum('pik,pkj->ij', Bd, Bx)

                if hyb != 0.0 or omega:
                    vk = hyb * kmat_dm(B)
                    if omega:
                        vk = vk + (alpha - hyb) * kmat_dm(data['Blr'])
                    vhf = vhf - 0.5 * vk
                    e2 = e2 - 0.25 * jnp.sum(vk * dm)
                return vhf, e2

            key = ('rks-df', self.xc, hyb, omega, data['B'].shape, aod.shape)
            return key, veff_fn, data, veff_dm_fn
        data['eri'] = self._get_eri()
        if omega:
            data['eri_lr'] = self._get_eri(omega)

        def veff_fn(data, dm, co):
            _, exc, vxc = core(data['aod'], data['weights'], dm)
            eri = data['eri']
            vj = jnp.einsum('ijkl,lk->ij', eri, dm)
            e2 = 0.5 * jnp.sum(vj * dm) + exc
            vhf = vxc + vj
            if hyb != 0.0 or omega:
                vk = hyb * jnp.einsum('ilkj,lk->ij', eri, dm)
                if omega:
                    vk = vk + (alpha - hyb) * jnp.einsum(
                        'ilkj,lk->ij', data['eri_lr'], dm)
                vhf = vhf - 0.5 * vk
                e2 = e2 - 0.25 * jnp.sum(vk * dm)
            return vhf, e2

        key = ('rks-eri', self.xc, hyb, omega, data['eri'].shape, aod.shape)
        return key, veff_fn, data, (lambda data, dm: veff_fn(data, dm, None))

    def get_veff(self, mol=None, dm=None, dm_last=None, vhf_last=None):
        mol = mol or self.mol
        if self.grids.coords is None:
            self.grids.build()
        n, exc, vxc = self._numint.nr_rks(mol, self.grids, self.xc, dm)
        if getattr(self, 'nlc', ''):
            from .vv10 import nr_vv10
            e_nlc, v_nlc = nr_vv10(mol, self.grids, dm,
                                   b=getattr(self, 'nlc_b', 5.9),
                                   C=getattr(self, 'nlc_C', 0.0093))
            exc = exc + e_nlc
            vxc = vxc + v_nlc
        omega, alpha, hyb = self._numint.rsh_and_hybrid_coeff(self.xc)
        if hyb == 0.0 and not omega:
            vj = self.get_j(mol, dm)
            ecoul = 0.5 * float(jnp.einsum('ij,ji->', vj, dm))
            vxc = vxc + vj
            ek = 0.0
        else:
            vj, vk = self.get_jk(mol, dm)
            vk = vk * hyb
            if omega:
                vk = vk + (alpha - hyb) * self.get_jk(mol, dm, with_j=False,
                                                      omega=omega)[1]
            ecoul = 0.5 * float(jnp.einsum('ij,ji->', vj, dm))
            ek = -0.25 * float(jnp.einsum('ij,ji->', vk, dm))
            vxc = vxc + vj - 0.5 * vk
        self._exc = exc
        self._ecoul = ecoul
        self._ek = ek
        return vxc

    def energy_elec(self, dm, h1e, vhf):
        e1 = float(jnp.einsum('ij,ji->', h1e, dm))
        return e1 + self._ecoul + self._exc + self._ek

    def nuc_grad_method(self):
        from ..grad import rks as rks_grad
        return rks_grad.Gradients(self)

    Gradients = nuc_grad_method

    def TDA(self, **kwargs):
        from ..tdscf import TDA
        return TDA(self, **kwargs)

    def TDDFT(self, **kwargs):
        from ..tdscf import TDDFT
        return TDDFT(self, **kwargs)
