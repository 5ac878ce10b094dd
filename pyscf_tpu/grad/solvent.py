"""Analytic nuclear gradients of C-PCM/COSMO solvation (analog of the
reference's pyscf/solvent/grad/pcm.py grad_elec/grad_nuc/grad_qv).

The C-PCM energy is variational in the surface charges:
  E(q; X) = q.v(X) + (1/2f) q.S(X).q,   stationary at q = -f S^-1 v,
so with the converged charges q AND the converged density D frozen, the
exact solvent gradient is the partial derivative dE/dX — obtained here by
jax.grad of ONE traceable function of the nuclear coordinates instead of
the reference's hand-coded dS/dx, dD/dx, dA/dx surface-matrix derivative
kernels. Cavity points ride rigidly on their parent atoms (fixed Lebedev
offsets, the exposed-point set frozen at the reference geometry — the
reference makes the same fixed-cavity approximation for its default
switching).
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..ops.device import integral_compute
from ..ops.integrals.int1e import nuc_chunk, ATOM_PAD
from .autodiff import _build_host_data_cached, _GradPairs


def pcm_grad(mf):
    """dE_solv/dX (natm, 3) for a converged C-PCM/COSMO SCF object."""
    pcm = mf.with_solvent
    if getattr(pcm, 'method', 'C-PCM') not in ('C-PCM', 'COSMO', 'CPCM'):
        raise NotImplementedError(
            'analytic solvent gradients: C-PCM/COSMO only (IEF-PCM energy '
            'is not variational in q in the symmetric form used here)')
    mol = mf.mol
    pts, area, atom_ids = pcm.surface
    dm = np.asarray(mf.make_rdm1())
    if dm.ndim == 3:
        dm = dm[0] + dm[1]

    # converged charges (host; same math as PCM.kernel)
    z = np.asarray(mol.charges, dtype=float)
    Rn = np.asarray(mol.coords)
    v_nuc = (z[None, :] / np.linalg.norm(
        pts[:, None, :] - Rn[None, :, :], axis=2)).sum(axis=1)
    vints = np.asarray(pcm._potential_ints())
    v = v_nuc - np.einsum('kij,ji->k', vints, dm)
    q = pcm._resp @ v

    npts = len(area)
    npad = -(-npts // ATOM_PAD) * ATOM_PAD
    offsets = jnp.asarray(pts - Rn[atom_ids])
    aids = jnp.asarray(atom_ids)
    qj = jnp.asarray(q)
    qpad = jnp.zeros(npad).at[:npts].set(qj)
    Zj = jnp.asarray(z)
    inv2f = 0.5 / pcm.f_eps

    if getattr(mf, 'with_df', None) is not None:
        pairs, _ = _build_host_data_cached(mol, mf.with_df.auxmol)
    else:
        ls = sorted(mol.shell_groups.keys())
        pairs = [p for p in (_GradPairs(mol, la, lb)
                             for la in ls for lb in ls if la <= lb)
                 if p.nsel > 0]
    dm_blocks = [sp.mat_blocks(dm) for sp in pairs]

    def e_solv(X):
        P = X[aids] + offsets                              # (npts, 3)
        # q . v_nuc
        r_pn = jnp.linalg.norm(P[:, None, :] - X[None, :, :], axis=2)
        e = jnp.sum(qj[:, None] * Zj[None, :] / r_pn)
        # q . v_ele = tr(D V[q]) with V[q] the point-charge "nuclear
        # attraction" of the surface charges (sign folded into nuc_chunk)
        Ppad = jnp.zeros((npad, 3)).at[:npts].set(P)
        for ip, sp in enumerate(pairs):
            a, b, A, B, w = sp.flat_prims(X)
            vq = nuc_chunk(sp.la, sp.lb, a, b, A, B, w, Ppad, qpad)
            e = e + sp.contract(vq, dm_blocks[ip])
        # (1/2f) q.S.q — off-diagonal only; the diagonal (fixed areas on a
        # rigid sphere) is geometry-independent and drops out of the grad
        d = P[:, None, :] - P[None, :, :]
        rr = jnp.sqrt(jnp.sum(d * d, axis=-1) + jnp.eye(npts))
        off = 1.0 - jnp.eye(npts)
        return e + inv2f * jnp.sum(off * qj[:, None] * qj[None, :] / rr)

    with integral_compute():
        g = jax.grad(e_solv)(jnp.asarray(Rn))
    return np.asarray(g)
