"""AFTDF: plane-wave density fitting with analytic Fourier transforms.

Reference analog: pyscf/pbc/df/aft.py (AFTDF:585) + aft_jk.py. Where
FFTDF samples AOs on the real-space mesh and FFTs numerically, AFTDF
evaluates F_uv(G) = FT[u v](G) analytically (ops/integrals/ft_ao.py,
lattice-summed over ket images) and contracts J/K directly in G space:

  rho(G)  = sum_uv F_uv(G) dm_vu
  vJ_uv   = (1/vol) sum_G coulG(G) rho(G)* F_uv(G)
  vK_uv   = (1/vol) sum_G,i coulG(G) F_ui(G) F_vi(G)*   (occupied i)

Gamma-point implementation; validated against the independently-built
FFTDF J/K in tests/test_pbc_aft.py.
"""
import numpy as np

from ...ops.integrals.ft_ao import ft_aopair_pbc
from .fft import FFTDF


class AFTDF(FFTDF):
    """Analytic-FT plane-wave DF (Gamma point)."""

    def __init__(self, cell, kpts=None):
        super().__init__(cell, kpts=kpts)
        self._ft_pair = None

    def ft_pair(self):
        if self._ft_pair is None:
            Gv = np.asarray(self.cell.get_Gv(self.mesh))
            self._ft_pair = ft_aopair_pbc(self.cell, Gv)
        return self._ft_pair

    def get_jk(self, dm, with_j=True, with_k=True, exxdiv=None):
        cell = self.cell
        Gv = np.asarray(cell.get_Gv(self.mesh))
        G2 = np.einsum('gx,gx->g', Gv, Gv)
        coulG = np.where(G2 > 1e-12, 4.0 * np.pi / np.maximum(G2, 1e-30),
                         0.0)
        F = self.ft_pair()                       # (nG, nao, nao)
        dm = np.asarray(dm)
        vol = cell.vol
        vj = vk = None
        if with_j:
            rho = np.einsum('guv,vu->g', F, dm)
            vj = np.einsum('g,g,guv->uv', coulG / vol, rho.conj(), F).real
        if with_k:
            evals, evecs = np.linalg.eigh(dm)
            keep = evals > 1e-10
            cocc = evecs[:, keep] * np.sqrt(np.maximum(evals[keep], 0.0))
            Fo = np.einsum('guv,vi->gui', F, cocc)
            vk = np.einsum('g,gui,gvi->uv', coulG / vol, Fo,
                           Fo.conj()).real
        return vj, vk
