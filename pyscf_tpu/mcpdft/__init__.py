"""Multiconfiguration pair-density functional theory (MC-PDFT).

Reference analog: pyscf/mcpdft (mcpdft.py energy_tot, otpd.py
get_ontop_pair_density, otfnal.py translated functionals).

    E = V_nn + sum h.D + 1/2 Tr(D J[D]) + E_ot[rho, Pi]

with the on-top pair density Pi(r) built from the CAS 1-/2-RDMs:
    Pi = rho_core^2/4 + rho_core*rho_act/2
         + 1/2 sum_uvwx Gamma_uvwx a_u a_v a_w a_x
(2-RDM in the chemists' E2-convention of fci.direct_spin1.make_rdm12),
and the "translated" spin densities of Li Manni et al. (JCTC 2014):
    R = 4 Pi / rho^2,  zeta = sqrt(max(0, 1-R)),
    rho_sigma' = rho/2 (1 +/- zeta),  grad rho_sigma' = (1+/-zeta)/2 grad rho.
"""
import numpy as np
import jax.numpy as jnp

from ..dft import gen_grid
from ..dft.xc import parse_xc
from ..ops import eval_gto
from ..fci import direct_spin1

OT_BASE = {
    'TPBE': 'pbe',
    'TLDA': 'lda,vwn3',
    'TLDA,VWN3': 'lda,vwn3',
    'TLDA,VWN5': 'lda,vwn5',
    'TBLYP': 'blyp',
}


def get_ontop_pair_density(mc, coords, deriv=0):
    """(rho (4,g) [or (1,g)], Pi (g,)) on the given grid points."""
    mol = mc.mol
    nc, ncas = mc.ncore, mc.ncas
    mo = np.asarray(mc.mo_coeff)
    dm1_act, dm2_act = direct_spin1.make_rdm12(mc.ci, ncas, mc.nelecas)
    dm1_act = np.asarray(dm1_act)
    dm2_act = np.asarray(dm2_act)

    ao = np.asarray(eval_gto.eval_ao(mol, coords, deriv=1))  # (4, g, nao)
    mo_c = mo[:, :nc]
    mo_a = mo[:, nc:nc + ncas]
    cvals = ao @ mo_c                     # (4, g, ncore)
    avals = ao @ mo_a                     # (4, g, ncas)
    rho_c = 2.0 * np.einsum('gi,gi->g', cvals[0], cvals[0])
    rho_a = np.einsum('gu,uv,gv->g', avals[0], dm1_act, avals[0])
    rho = rho_c + rho_a
    grad = (4.0 * np.einsum('xgi,gi->xg', cvals[1:], cvals[0])
            + 2.0 * np.einsum('xgu,uv,gv->xg', avals[1:], dm1_act, avals[0]))
    # Pi
    a0 = avals[0]
    tmp = np.einsum('uvwx,gw,gx->guv', dm2_act, a0, a0, optimize=True)
    pi_act = 0.5 * np.einsum('guv,gu,gv->g', tmp, a0, a0, optimize=True)
    Pi = 0.25 * rho_c ** 2 + 0.5 * rho_c * rho_a + pi_act
    return np.concatenate([rho[None], grad]), Pi


def translate(rho4, Pi):
    """Translated spin densities: (ra, rb, saa, sab, sbb)."""
    rho = rho4[0]
    rr = np.maximum(rho, 1e-30)
    R = 4.0 * Pi / rr ** 2
    zeta = np.sqrt(np.clip(1.0 - R, 0.0, None))
    ra = 0.5 * rho * (1.0 + zeta)
    rb = 0.5 * rho * (1.0 - zeta)
    s_tot = np.einsum('xg,xg->g', rho4[1:], rho4[1:])
    saa = 0.25 * (1.0 + zeta) ** 2 * s_tot
    sab = 0.25 * (1.0 + zeta) * (1.0 - zeta) * s_tot
    sbb = 0.25 * (1.0 - zeta) ** 2 * s_tot
    return ra, rb, saa, sab, sbb


def energy_ot(mc, otxc='tPBE', grids=None):
    """On-top functional energy E_ot."""
    base = OT_BASE.get(otxc.upper().replace(' ', ''))
    if base is None:
        raise NotImplementedError(f'on-top functional {otxc}')
    xc = parse_xc(base)
    if grids is None:
        grids = gen_grid.Grids(mc.mol).build()
    coords = np.asarray(grids.coords)
    weights = np.asarray(grids.weights)
    e_ot = 0.0
    BLK = 8192
    for g0 in range(0, len(coords), BLK):
        c = coords[g0:g0 + BLK]
        w = weights[g0:g0 + BLK]
        rho4, Pi = get_ontop_pair_density(mc, c)
        ra, rb, saa, sab, sbb = translate(rho4, Pi)
        ed = np.asarray(xc.exc_density(jnp.asarray(ra), jnp.asarray(rb),
                                       jnp.asarray(saa), jnp.asarray(sab),
                                       jnp.asarray(sbb)))
        e_ot += float(w @ ed)
    return e_ot


def energy_tot(mc, otxc='tPBE', grids=None):
    """Total MC-PDFT energy on top of a converged CASCI/CASSCF."""
    mol = mc.mol
    nc, ncas = mc.ncore, mc.ncas
    mo = np.asarray(mc.mo_coeff)
    dm1_act = np.asarray(direct_spin1.make_rdm1(mc.ci, ncas, mc.nelecas))
    dm_ao = (2.0 * mo[:, :nc] @ mo[:, :nc].T
             + mo[:, nc:nc + ncas] @ dm1_act @ mo[:, nc:nc + ncas].T)
    h = np.asarray(mc._scf.get_hcore())
    vj = np.asarray(mc._scf.get_jk(mol, jnp.asarray(dm_ao), with_k=False)[0])
    e1 = float(np.einsum('ij,ji->', h, dm_ao))
    ej = 0.5 * float(np.einsum('ij,ji->', vj, dm_ao))
    e_ot = energy_ot(mc, otxc, grids)
    return mol.energy_nuc() + e1 + ej + e_ot


class PDFT:
    """MC-PDFT driver wrapping a converged CASCI/CASSCF object
    (reference mcpdft.CASCI/CASSCF energy path)."""

    def __init__(self, mc, otxc='tPBE'):
        self._mc = mc
        self.otxc = otxc
        self.grids = None
        self.e_tot = None
        self.e_mcscf = None

    def kernel(self):
        mc = self._mc
        if mc.ci is None:
            mc.kernel()
        self.e_mcscf = mc.e_tot
        self.e_tot = energy_tot(mc, self.otxc, self.grids)
        return self.e_tot
