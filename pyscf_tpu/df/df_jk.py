"""Density-fitted J/K builds (analog of reference pyscf/df/df_jk.py:31,280).

All contractions are dense dot_generals on the MXU:
    J_ij = B[P,ij] (B[P,kl] dm_lk)
    K_ij = B[P,il] dm_lk B[P,kj]      (or via occupied MOs when available)
"""
import jax
import jax.numpy as jnp


@jax.jit
def _jk_from_dm(B, dm):
    rho = jnp.einsum('pkl,lk->p', B, dm)
    vj = jnp.einsum('p,pij->ij', rho, B)
    Bd = jnp.einsum('pil,lk->pik', B, dm)
    vk = jnp.einsum('pik,pkj->ij', Bd, B)
    return vj, vk


@jax.jit
def _j_from_dm(B, dm):
    rho = jnp.einsum('pkl,lk->p', B, dm)
    return jnp.einsum('p,pij->ij', rho, B)


@jax.jit
def _k_from_mo(B, co):
    """K from occupied orbitals: O(naux nao^2 nocc), better than dm path."""
    Bo = jnp.einsum('pij,jo->pio', B, co)
    return jnp.einsum('pio,pjo->ij', Bo, Bo)


@jax.jit
def _bmo(B, ca, cb):
    return jnp.einsum('pij,ia,jb->pab', B, ca, cb)


def get_jk(dfobj, dm, with_j=True, with_k=True, mo_coeff_occ=None):
    """J/K from the DF factor. If mo_coeff_occ (already scaled by
    sqrt(occupation)) is given, K uses the O(naux nao^2 nocc) occupied-
    orbital path instead of the O(naux nao^3) density path."""
    B = dfobj.cderi
    dm = jnp.asarray(dm)
    single = dm.ndim == 2
    dms = dm[None] if single else dm
    cos = None
    if mo_coeff_occ is not None:
        cos = [mo_coeff_occ] if single else list(mo_coeff_occ)
    vjs, vks = [], []
    for i, d in enumerate(dms):
        vj = _j_from_dm(B, d) if with_j else None
        if with_k:
            if cos is not None:
                vk = _k_from_mo(B, cos[i])
            else:
                vk = _jk_from_dm(B, d)[1]
        else:
            vk = None
        vjs.append(vj)
        vks.append(vk)
    if single:
        return vjs[0], vks[0]
    stack = lambda xs: None if xs[0] is None else jnp.stack(xs)
    return stack(vjs), stack(vks)


def density_fit(mf, auxbasis=None):
    """Attach a DF engine to a mean-field object (reference df_jk.py:31)."""
    from .df import DF
    mf.with_df = DF(mf.mol, auxbasis)
    return mf


# ---------------------------------------------------------------------------
# Large-system streaming path: scan over aux chunks so XLA's peak HBM is
# bounded by (chunk, nao, nao) temporaries instead of the whole B factor
# plus its per-einsum layout copies (a 580-AO / 1390-aux fused SCF program
# otherwise requests ~80 GB on a 16 GB chip). Analog of the reference's
# max_memory-blocked with_df.loop() (pyscf/df/df.py:40).
# ---------------------------------------------------------------------------

DF_CHUNK_ELEMS = 2.0e8        # activation: stream when B has more elements
DF_CHUNK_BUDGET = 2.5e7       # per-chunk element budget (chunk*nao*nao)


def jk_chunked(B, dm, co=None, chunk=None):
    """(vj, vk) streaming aux slices of the UNCOPIED B via dynamic_slice.

    Bounds XLA's peak HBM to (chunk, nao, nao) temporaries without the
    round-4 padded-chunk copy of B (which doubled resident memory at
    nao=580 and crashed the TPU worker). co=None uses the density form.
    """
    naux, nao = B.shape[0], B.shape[1]
    dt = dm.dtype
    if chunk is None:
        chunk = max(8, int(DF_CHUNK_BUDGET / (nao * nao)))
        chunk = min(chunk, naux)
    nsteps = -(-naux // chunk)

    def body(i, carry):
        vj, vk = carry
        off = i * chunk
        start = jnp.minimum(off, naux - chunk)
        Bx = jax.lax.dynamic_slice_in_dim(B, start, chunk, axis=0)
        # the final slice is clamped in-bounds; zero out rows that the
        # previous step already accumulated
        mask = (start + jnp.arange(chunk)) >= off
        Bx = Bx * mask[:, None, None].astype(dt)
        rho = jnp.einsum('pkl,lk->p', Bx, dm)
        vj = vj + jnp.einsum('p,pij->ij', rho, Bx)
        if co is None:
            Bd = jnp.einsum('pil,lk->pik', Bx, dm)
            vk = vk + jnp.einsum('pik,pkj->ij', Bd, Bx)
        else:
            Bo = jnp.einsum('pij,jo->pio', Bx, co)
            vk = vk + jnp.einsum('pio,pjo->ij', Bo, Bo)
        return (vj, vk)

    init = (jnp.zeros((nao, nao), dt), jnp.zeros((nao, nao), dt))
    return jax.lax.fori_loop(0, nsteps, body, init)
