"""VV10 nonlocal correlation (Vydrov & Van Voorhis, JCP 133, 244103
(2010)).

Reference analog: pyscf/dft/numint.py _vv10nlc:471. The double grid sum

  E = sum_i w_i rho_i [ beta + 1/2 sum_j w_j rho_j Phi_ij ],
  Phi_ij = -3/2 / (g_i g_j (g_i + g_j)),
  g_i = omega0_i R_ij^2 + kappa_i,
  omega0 = sqrt(C (s^2)^2 + (4 pi/3) rho),  s^2 = |grad rho|^2 / rho^2,
  kappa = b (3 pi/2) (rho/(9 pi))^(1/6),
  beta = (1/32) (3/b^2)^(3/4)

is evaluated in grid-block tiles (pairwise distance GEMM shapes on the
MXU); the SCF potential comes from jax.grad of the energy with respect
to the per-point (rho, |grad rho|^2) features — no hand-coded kernel
derivatives (replacing the reference's analytic vvrho/vvweight algebra).
"""
import jax
import jax.numpy as jnp
import numpy as np

RHO_CUT = 1e-8


def _vv10_energy_features(rho, g2, coords, weights, b, C, block=2048):
    """E_nlc as a pure function of grid features (differentiable).

    The pairwise kernel is evaluated in (block, Ngrid) row tiles inside a
    lax.scan so memory stays O(block*Ngrid); autodiff flows through the
    scan for the SCF potential.
    """
    ng = rho.shape[0]
    mask = rho > RHO_CUT
    rho_s = jnp.where(mask, rho, 1.0)
    g2_s = jnp.where(mask, g2, 0.0)
    w = jnp.where(mask, weights, 0.0)
    beta = 0.03125 * (3.0 / (b * b)) ** 0.75
    s2 = g2_s / (rho_s * rho_s)
    omega0 = jnp.sqrt(C * s2 * s2 + (4.0 * jnp.pi / 3.0) * rho_s)
    kappa = b * (1.5 * jnp.pi) * (rho_s / (9.0 * jnp.pi)) ** (1.0 / 6.0)
    wr = w * rho_s

    npad = (-ng) % block
    def pad(x, fill=0.0):
        return jnp.concatenate([x, jnp.full((npad,) + x.shape[1:], fill,
                                            x.dtype)]) if npad else x
    co_p = pad(coords)
    om_p = pad(omega0, 1.0)
    ka_p = pad(kappa, 1.0)
    wr_p = pad(wr)
    nblk = (ng + npad) // block

    def row_block(carry, blk):
        ci, oi, ki, wi = blk
        r2 = jnp.sum((ci[:, None, :] - coords[None, :, :]) ** 2, axis=-1)
        gi = oi[:, None] * r2 + ki[:, None]
        gj = omega0[None, :] * r2 + kappa[None, :]
        phi = -1.5 / (gi * gj * (gi + gj))
        inner = phi @ wr                      # (block,)
        return carry + jnp.sum(wi * 0.5 * inner), None

    blocks = (co_p.reshape(nblk, block, 3), om_p.reshape(nblk, block),
              ka_p.reshape(nblk, block), wr_p.reshape(nblk, block))
    e_nl, _ = jax.lax.scan(row_block, 0.0, blocks)
    return e_nl + jnp.sum(wr * beta)


_vv10_grad = jax.jit(jax.value_and_grad(_vv10_energy_features,
                                        argnums=(0, 1)),
                     static_argnums=(4, 5))


def nr_vv10(mol, grids, dm, b=5.9, C=0.0093, ao_eval=None):
    """(E_nlc, Vmat) for a closed-shell density matrix."""
    from ..ops.eval_gto import eval_ao
    coords = jnp.asarray(grids.coords)
    weights = jnp.asarray(grids.weights)
    aod = (ao_eval if ao_eval is not None
           else eval_ao(mol, coords, deriv=1))       # (4, ng, nao)
    ao = aod[0]
    dm = jnp.asarray(dm)
    dmao = ao @ dm
    rho = jnp.maximum(jnp.einsum('bi,bi->b', dmao, ao), 0.0)
    grho = 2.0 * jnp.einsum('bi,dbi->db', dmao, aod[1:])
    g2 = jnp.einsum('db,db->b', grho, grho)
    e, (de_drho, de_dg2) = _vv10_grad(rho, g2, coords, weights,
                                      float(b), float(C))
    # V = sum_g [de/drho phi_u phi_v + de/dg2 * 2 grad(rho).grad(phi_u phi_v)]
    vmat = jnp.einsum('b,bi,bj->ij', de_drho, ao, ao)
    wgrad = 2.0 * jnp.einsum('b,db->db', de_dg2, grho)
    half = jnp.einsum('db,dbi,bj->ij', wgrad, aod[1:], ao)
    vmat = vmat + half + half.T
    return float(e), vmat


class VV10Mixin:
    """Adds .nlc ('vv10' or '') handling to an RKS object."""
    nlc = ''
    nlc_b = 5.9
    nlc_C = 0.0093
