"""Perturbative triples (T) in the spin-orbital basis.

Reference analog: pyscf/cc/gccsd_t.py (C loop lib/cc/uccsd_t.c).
Standard expressions (Crawford & Schaefer review):

  D t3c = P(i/jk) P(a/bc) [ sum_e t2[jk,ae] <ei||bc>
                            - sum_m t2[im,bc] <ma||jk> ]
  D t3d = P(i/jk) P(a/bc) t1[ia] <jk||bc>
  E(T)  = 1/36 sum W (W + V) / D,  W = D t3c, V = D t3d

Evaluated as a vmap over occupied triples (i,j,k): each lane builds its
(nv,nv,nv) block with two GEMMs — regular shapes, MXU-friendly, memory
bounded by the triple batch instead of the o^3 v^3 tensor.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(4, 5))
def _et_batch(ijk, wts, tensors, mo_parts, nocc, st_fac):
    t1, t2, vovv, ovoo, oovv = tensors
    eo, ev = mo_parts

    def one(idx):
        i, j, k = idx[0], idx[1], idx[2]

        def base_w(ii, jj, kk):
            # <Phi_ijk^abc|V T2|0> for complex orbitals: the particle-line
            # term needs conj(<e i||b c>), the hole-line term the
            # unconjugated <m a||j k> (pinned by phase-rotation invariance
            # of E(T) in tests; no-op for real orbitals)
            w = jnp.einsum('ae,ebc->abc', t2[jj, kk],
                           jnp.conj(vovv[:, ii]))
            w -= jnp.einsum('mbc,ma->abc', t2[ii],
                            ovoo[:, :, jj, kk])
            return w

        def base_v(ii, jj, kk):
            return t1[ii][:, None, None] * jnp.conj(
                oovv[jj, kk][None, :, :])

        def p_ijk(f):
            return f(i, j, k) - f(j, i, k) - f(k, j, i)

        def p_abc(x):
            return (x - jnp.transpose(x, (1, 0, 2))
                    - jnp.transpose(x, (2, 1, 0)))

        w = p_abc(p_ijk(base_w))
        vv = p_abc(p_ijk(base_v))
        d = (eo[i] + eo[j] + eo[k]
             - ev[:, None, None] - ev[None, :, None] - ev[None, None, :])
        # complex Bloch orbitals: t3 = conj(W)/D, E = sum (W + V) t3
        return jnp.sum(jnp.conj(w) * (w + st_fac * vv) / d).real

    return jnp.sum(wts * jax.vmap(one)(ijk))


def kernel(eris, mo_e, nocc, t1, t2, batch=128, st_fac=1.0):
    """E(T) for spin-orbital amplitudes. eris is <pq||rs> physicists'.

    st_fac scales the disconnected (singles-triples) V term: 1.0 gives
    CCSD(T); 2.0 gives QCISD(T) (reference lib/cc/ccsd_t.c QCIsd_t_contract
    passes fac=2.0 into contract6).
    """
    nocc = int(nocc)
    o = slice(0, nocc)
    v = slice(nocc, None)
    vovv = jnp.asarray(eris[v, o, v, v])
    ovoo = jnp.asarray(eris[o, v, o, o])
    oovv = jnp.asarray(eris[o, o, v, v])
    eo = jnp.asarray(mo_e[:nocc])
    ev = jnp.asarray(mo_e[nocc:])
    idx = np.stack(np.meshgrid(np.arange(nocc), np.arange(nocc),
                               np.arange(nocc), indexing='ij'),
                   axis=-1).reshape(-1, 3)
    tensors = (jnp.asarray(t1), jnp.asarray(t2), vovv, ovoo, oovv)
    total = 0.0
    for p0 in range(0, len(idx), batch):
        blk = idx[p0:p0 + batch]
        n_real = len(blk)
        if n_real < batch:            # pad+mask: one compiled shape total
            blk = np.concatenate(
                [blk, np.zeros((batch - n_real, 3), dtype=blk.dtype)])
        wts = jnp.asarray((np.arange(batch) < n_real).astype(np.float64))
        total += float(_et_batch(jnp.asarray(blk), wts, tensors, (eo, ev),
                                 nocc, float(st_fac)))
    return total / 36.0
