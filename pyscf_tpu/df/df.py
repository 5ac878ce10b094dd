"""Density-fitting object: 3-index factorization of the ERI tensor.

Analog of reference pyscf/df/df.py (DF:40) + incore.cholesky_eri
(df/incore.py:129). The B tensor satisfies (ij|kl) ~= sum_P B[P,i,j] B[P,k,l]
with B = L^{-1} (P|ij), j2c = (P|Q) = L L^T. Kept dense in HBM — the
reference's HDF5 spill path is replaced by device memory + sharding.
"""
import jax
import jax.numpy as jnp
import numpy as np

from . import addons


class DF:
    def __init__(self, mol, auxbasis=None, omega=None):
        self.mol = mol
        self.auxbasis = auxbasis
        self.omega = omega      # erf(w r)/r long-range metric (RSH K)
        self.auxmol = None
        self._cderi = None      # (naux, nao, nao)

    @property
    def naux(self):
        return self.auxmol.nao

    def build(self):
        from ..ops.device import integral_compute, to_compute_device
        from ..ops.integrals import int2e as int2e_mod
        mol = self.mol
        # the factorization depends only on (geometry, basis, auxbasis,
        # omega): cache it on the Mole so fresh mean-field objects on the
        # same molecule skip the rebuild (the per-geometry analog of the
        # reference's on-disk _cderi reuse, pyscf/df/df.py:40)
        cache = getattr(mol, '_df_cache', None)
        if cache is None:
            cache = mol._df_cache = {}
        key = (str(self.auxbasis), self.omega)
        if key in cache:
            self.auxmol, self._cderi = cache[key]
            return self
        self.auxmol = addons.make_auxmol(mol, self.auxbasis)
        from ..ops.integrals.j3c import df_factor
        # v2 engine: device-resident, sph-folded, program-count-disciplined
        # (ops/integrals/j3c.py); B never crosses the host-device link.
        self._cderi = to_compute_device(
            df_factor(mol, self.auxmol, omega=self.omega))
        cache[key] = (self.auxmol, self._cderi)
        return self

    @property
    def cderi(self):
        if self._cderi is None:
            self.build()
        return self._cderi

    def loop(self, blksize=None):
        yield self.cderi

    def get_jk(self, dm, hermi=1, with_j=True, with_k=True):
        from .df_jk import get_jk
        return get_jk(self, dm, with_j=with_j, with_k=with_k)

    def ao2mo(self, mo_coeffs):
        """(ia|jb)-style MO integrals from the DF factorization."""
        from .df_jk import _bmo
        if not isinstance(mo_coeffs, (list, tuple)):
            mo_coeffs = (mo_coeffs,) * 4
        Bij = _bmo(self.cderi, mo_coeffs[0], mo_coeffs[1])
        Bkl = _bmo(self.cderi, mo_coeffs[2], mo_coeffs[3])
        return jnp.einsum('pij,pkl->ijkl', Bij, Bkl)

    def reset(self, mol=None):
        if mol is not None:
            self.mol = mol
        self._cderi = None
        self.auxmol = None
        return self
