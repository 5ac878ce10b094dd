"""Generalized (spinor-basis) MP2 over a GHF reference.

Reference analog: pyscf/mp/gmp2.py. The spin-orbital MO integrals are
built from the spatial AO ERI by summing the alpha and beta blocks of the
GHF coefficients in each pair density — two dense einsum chains (MXU),
no spin-blocked bookkeeping.

  E = 1/4 sum_ijab |<ij||ab>|^2 / (ei + ej - ea - eb)
"""
import jax.numpy as jnp
import numpy as np


def _mo_ovov(eri_ao, co, cv, nao):
    """(ia|jb) spin-orbital chemist ERIs from the spatial AO tensor."""
    coa, cob = co[:nao], co[nao:]
    cva, cvb = cv[:nao], cv[nao:]
    eri = jnp.asarray(eri_ao).reshape((nao,) * 4)
    # half transform on the first pair: d_ia(uv) = sum_s Ca + Cb blocks
    half = (jnp.einsum('uvls,ui,va->ials', eri, coa.conj(), cva)
            + jnp.einsum('uvls,ui,va->ials', eri, cob.conj(), cvb))
    full = (jnp.einsum('ials,lj,sb->iajb', half, coa.conj(), cva)
            + jnp.einsum('ials,lj,sb->iajb', half, cob.conj(), cvb))
    return full


def kernel(mf, frozen=0):
    mol = mf.mol
    nao = mol.nao
    occ_mask = np.asarray(mf.mo_occ) > 0
    c = np.asarray(mf.mo_coeff)
    e = np.asarray(mf.mo_energy)
    co = c[:, occ_mask][:, frozen:]
    cv = c[:, ~occ_mask]
    eo = e[occ_mask][frozen:]
    ev = e[~occ_mask]
    eri_ao = mol.intor('int2e')
    v = _mo_ovov(eri_ao, jnp.asarray(co), jnp.asarray(cv), nao)
    anti = v - jnp.transpose(v, (0, 3, 2, 1))          # (ia|jb)-(ib|ja)
    d = (eo[:, None, None, None] - ev[None, :, None, None]
         + eo[None, None, :, None] - ev[None, None, None, :])
    t2 = anti / jnp.asarray(d)
    emp2 = 0.25 * jnp.einsum('iajb,iajb->', t2, anti.conj()).real
    return float(emp2), np.asarray(t2)


class GMP2:
    """MP2 in the generalized spin-orbital basis (covers any GHF,
    including spin-broken solutions a UMP2 cannot describe)."""

    def __init__(self, mf, frozen=0):
        self._scf = mf
        self.mol = mf.mol
        self.frozen = frozen or 0
        self.e_corr = None
        self.t2 = None

    def kernel(self):
        self.e_corr, self.t2 = kernel(self._scf, self.frozen)
        self.e_tot = float(self._scf.e_tot) + self.e_corr
        return self.e_corr, self.t2
