"""Seminumerical exchange (SGX / chain-of-spheres COSX).

Reference analog: pyscf/sgx/sgx.py (SGX:287, sgx_fit:36) + sgx_jk.py
(get_jk_favork), whose C engine (lib/vhf/nr_sgx_direct.c) loops grid blocks
against shell pairs. Here the G tensor  G[g,i,j] = <i| 1/|r-r_g| |j>  comes
from the batched McMurchie-Davidson kernel (ops/integrals/int1e.py
rinv_points_chunk) and everything else is dense MXU contractions:

    K_uv ~ sum_g  ao[g,u] * sum_t G[g,v,t] (w_g sum_l D_tl ao[g,l])

with the overlap-fitting projection  P = S_num^-1 S  applied on the left
(reference get_jk_favork), which restores smooth convergence on coarse
grids.
"""
import numpy as np
import jax.numpy as jnp

from ..dft import gen_grid
from ..ops import eval_gto
from ..ops.integrals.int1e import int1e_rinv_points

BLKSIZE = 512


class SGX:
    """Seminumerical J/K engine (reference sgx.SGX)."""

    def __init__(self, mol, auxbasis=None):
        self.mol = mol
        self.auxbasis = auxbasis
        self.grids_level_i = 0
        self.grids_level_f = 1
        self.dfj = auxbasis is not None
        self.grids = None
        self._df = None

    # cache (ao, wao, G) blocks when the G tensor fits in this many floats
    _cache_max_elems = 3e8

    def build(self, level=None):
        g = gen_grid.Grids(self.mol)
        g.level = self.grids_level_f if level is None else level
        g.build()
        self.grids = g
        if self.dfj and self._df is None:
            from ..df.df import DF
            self._df = DF(self.mol, self.auxbasis).build()
        # geometry-fixed data: AO values and the 1/|r-r_g| tensor per block
        self._blocks = None
        ngrid = len(np.asarray(g.coords))
        if ngrid * self.mol.nao ** 2 <= self._cache_max_elems:
            self._blocks = list(self._gen_blocks())
        return self

    def _gen_blocks(self):
        mol = self.mol
        coords = np.asarray(self.grids.coords)
        weights = np.asarray(self.grids.weights)
        for g0 in range(0, len(coords), BLKSIZE):
            g1 = min(g0 + BLKSIZE, len(coords))
            c = coords[g0:g1]
            w = jnp.asarray(weights[g0:g1])
            ao = jnp.asarray(eval_gto.eval_ao(mol, c))
            G = int1e_rinv_points(mol, c)
            yield ao, ao * w[:, None], G

    def get_jk(self, dm, hermi=1, with_j=True, with_k=True):
        if self.grids is None:
            self.build()
        mol = self.mol
        nao = mol.nao
        dm = np.asarray(dm)
        single = dm.ndim == 2
        dms = dm[None] if single else dm
        nset = dms.shape[0]
        dms_j = jnp.asarray(dms)

        sn = jnp.zeros((nao, nao))
        vj = jnp.zeros((nset, nao, nao))
        vk = jnp.zeros((nset, nao, nao))
        blocks = self._blocks if self._blocks is not None else \
            self._gen_blocks()
        for ao, wao, G in blocks:
            sn = sn + ao.T @ wao
            fg = jnp.einsum('xtl,gl->xtg', dms_j, wao)      # (x, nao, g)
            if with_j:
                jg = jnp.einsum('gij,xij->xg', G, dms_j)
                vj = vj + jnp.einsum('gu,gv,xg->xuv', wao, ao, jg)
            if with_k:
                gv = jnp.einsum('gvt,xtg->xvg', G, fg)
                vk = vk + jnp.einsum('gu,xvg->xuv', ao, gv)
        # overlap fitting: project with P = Sn^-1 S
        ovlp = jnp.asarray(mol.intor('int1e_ovlp'))
        proj = jnp.linalg.solve(sn, ovlp)
        if with_j:
            if self.dfj:
                from ..df.df_jk import get_jk as df_get_jk
                vj = df_get_jk(self._df, jnp.asarray(dms), with_k=False)[0]
            else:
                vj = jnp.einsum('pi,xpj->xij', proj, vj)
                vj = 0.5 * (vj + vj.transpose(0, 2, 1))
        if with_k:
            vk = jnp.einsum('pi,xpj->xij', proj, vk)
            if hermi == 1:
                vk = 0.5 * (vk + vk.transpose(0, 2, 1))
        if single:
            return (vj[0] if with_j else None,
                    vk[0] if with_k else None)
        return (vj if with_j else None, vk if with_k else None)


def sgx_fit(mf, auxbasis=None):
    """Attach a seminumerical-exchange engine to a mean-field object
    (reference sgx.sgx_fit): K (and J unless auxbasis/dfj) on grids."""
    mf.with_sgx = SGX(mf.mol, auxbasis)
    return mf
