"""AO values (and gradients) on grid points.

Analog of reference pyscf/gto/eval_gto.py -> C GTOval_sph_deriv*
(lib/gto/grid_ao_drv.c). Evaluates all shells of each angular-momentum
class as one vectorized kernel: radial parts via exp, angular parts via
cartesian monomials x cart2sph matmul (MXU). Returns dense (npts, nao)
blocks; designed to be called inside a jitted numint program.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .integrals.cart2sph import cart2sph
from .integrals.hermite import cart_components


def _class_ao(l, pts, exps, coeffs, centers, deriv):
    """AO values for all shells of one l-class.

    pts (C,3); exps/coeffs (ns,K); centers (ns,3).
    Returns (ncomp, C, ns*(2l+1)) with ncomp = 1 (values) or 4 (+d/dx,y,z).
    """
    diff = pts[:, None, :] - centers[None, :, :]          # (C, ns, 3)
    r2 = jnp.sum(diff * diff, axis=-1)                    # (C, ns)
    expo = jnp.exp(-exps[None, :, :] * r2[:, :, None])    # (C, ns, K)
    rad = jnp.sum(coeffs[None] * expo, axis=-1)           # (C, ns)
    carts = cart_components(l)
    x, y, z = diff[..., 0], diff[..., 1], diff[..., 2]

    def mono(ax, ay, az):
        m = jnp.ones_like(r2)
        if ax:
            m = m * x ** ax
        if ay:
            m = m * y ** ay
        if az:
            m = m * z ** az
        return m

    vals_cart = jnp.stack([mono(*c) * rad for c in carts], axis=-1)
    S = jnp.asarray(cart2sph(l))                          # (2l+1, ncart)
    out = [jnp.einsum('cnp,mp->cnm', vals_cart, S)]
    if deriv >= 1:
        drad = jnp.sum(-2.0 * exps[None] * coeffs[None] * expo, axis=-1)
        for d in range(3):
            comp = []
            for (ax, ay, az) in carts:
                pw = (ax, ay, az)[d]
                dm = pw * mono(*(c - (1 if i == d else 0)
                                 for i, c in enumerate((ax, ay, az)))) \
                    if pw else jnp.zeros_like(r2)
                dmono = dm * rad + mono(ax, ay, az) * diff[..., d] * drad
                comp.append(dmono)
            comp = jnp.stack(comp, axis=-1)
            out.append(jnp.einsum('cnp,mp->cnm', comp, S))
    out = jnp.stack(out)                                   # (ncomp, C, ns, 2l+1)
    ncomp, C, ns = out.shape[0], out.shape[1], out.shape[2]
    return out.reshape(ncomp, C, ns * (2 * l + 1))


def eval_ao(mol, coords, deriv=0, atom_coords=None):
    """AO values on coords (n,3): returns (nao, n) ... actually (ncomp, n, nao).

    deriv=0 -> (n, nao); deriv=1 -> (4, n, nao) [value, d/dx, d/dy, d/dz].
    Traceable: safe to call inside jit with static mol. If atom_coords
    (natm, 3) is given (possibly a tracer), shell centers are gathered from
    it — this makes AO values differentiable wrt nuclear positions (used by
    the autodiff XC gradient, grad/autodiff.py).
    """
    coords = jnp.asarray(coords)
    cols = []
    col_order = []
    for l, g in mol.shell_groups.items():
        centers = (jnp.asarray(g.coords) if atom_coords is None
                   else atom_coords[jnp.asarray(g.atom_ids)])
        blk = _class_ao(l, coords, jnp.asarray(g.exps), jnp.asarray(g.coeffs),
                        centers, deriv)
        cols.append(blk)
        for off in g.ao_off:
            col_order.extend(range(off, off + 2 * l + 1))
    ao = jnp.concatenate(cols, axis=-1)
    # permute concatenated class-columns into AO order
    perm = np.argsort(np.asarray(col_order))
    ao = ao[..., perm]
    if deriv == 0:
        return ao[0]
    return ao


def eval_gto(mol, name, coords, **kwargs):
    """Dispatcher mirroring mol.eval_gto names."""
    if 'deriv1' in name or 'ip' in name:
        return eval_ao(mol, coords, deriv=1)
    return eval_ao(mol, coords, deriv=0)
