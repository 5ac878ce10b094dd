"""Distributed k-point MP2: k-triples sharded over the device mesh.

TPU-native replacement for the reference's MPI-distributed periodic
post-HF (pyscf/pbc/mpitools + pbc/mpicc partitioning k-blocks over
ranks): the (ki, kj, ka) triple loop becomes a shard_map over a
jax.sharding.Mesh — each device evaluates its triple block's MO-ERI
tensors (batched FFTs + GEMMs, all inside one jitted program) and the
energy is reduced with a psum over ICI.

Numerically identical to pbc/mp/kmp2.py (tests/test_parallel assertions
on the 8-virtual-device CPU mesh).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .kmp2 import kconserve_index


def _stack_mo(mf):
    nk = len(np.asarray(mf.kpts).reshape(-1, 3))
    occs, virts, eo, ev = [], [], [], []
    for k in range(nk):
        o = np.asarray(mf.mo_occ[k]) > 0
        c = np.asarray(mf.mo_coeff[k])
        e = np.asarray(mf.mo_energy[k])
        occs.append(c[:, o])
        virts.append(c[:, ~o])
        eo.append(e[o])
        ev.append(e[~o])
    return (np.stack(occs), np.stack(virts), np.stack(eo), np.stack(ev))


def kernel_sharded(mf, mesh_dev=None):
    """MP2 correlation energy per cell, k-triples over the device mesh."""
    cell = mf.cell
    kpts = np.asarray(mf.kpts).reshape(-1, 3)
    nk = len(kpts)
    fft_mesh = tuple(int(x) for x in cell.mesh)
    ngrid = int(np.prod(fft_mesh))
    w = cell.vol / ngrid
    coords = jnp.asarray(np.asarray(cell.get_uniform_grids(fft_mesh)))
    Gv = np.asarray(cell.get_Gv(fft_mesh))
    ao_k = np.asarray(mf.with_df._ao_on_grid_kpts())     # (nk, ng, nao)
    co, cv, eo, ev = _stack_mo(mf)
    psio = jnp.asarray(np.einsum('kgu,kui->kgi', ao_k, co))
    psiv = jnp.asarray(np.einsum('kgu,kua->kga', ao_k, cv))
    eo = jnp.asarray(eo)
    ev = jnp.asarray(ev)
    kpts_j = jnp.asarray(kpts)
    Gv_j = jnp.asarray(Gv)
    kconserv = kconserve_index(cell, kpts)

    def pair_v(k1, k2):
        """v_ia(g): Coulomb-convolved periodic occ-virt pair densities."""
        q = kpts_j[k2] - kpts_j[k1]
        phase = jnp.exp(-1j * (coords @ q))
        p = (jnp.conj(psio[k1])[:, :, None] * psiv[k2][:, None, :]
             * phase[:, None, None])
        Gq2 = jnp.sum((Gv_j + q) ** 2, axis=1)
        coulG = jnp.where(Gq2 > 1e-12, 4.0 * jnp.pi / Gq2, 0.0)
        pG = jnp.fft.fftn(p.reshape(*fft_mesh, *p.shape[1:]), axes=(0, 1, 2))
        vg = jnp.fft.ifftn(pG * coulG.reshape(*fft_mesh, 1, 1),
                           axes=(0, 1, 2))
        return p, vg.reshape(ngrid, *p.shape[1:])

    def block(ki, ka, kj, kb):
        """(ia|jb) at the k-quartet (chemist)."""
        p12, v12 = pair_v(ki, ka)
        p34, _ = pair_v(kj, kb)
        q12 = kpts_j[ka] - kpts_j[ki]
        q34 = kpts_j[kb] - kpts_j[kj]
        ph = jnp.exp(1j * (coords @ (q12 + q34)))
        right = (p34 * ph[:, None, None]).reshape(ngrid, -1)
        out = w * (v12.reshape(ngrid, -1).T @ right)
        no, nv = p12.shape[1], p12.shape[2]
        return out.reshape(no, nv, no, nv)

    def triple_energy(t):
        ki, kj, ka, kb = t[0], t[1], t[2], t[3]
        v = block(ki, ka, kj, kb)
        wx = block(ki, kb, kj, ka)
        d = (eo[ki][:, None, None, None] - ev[ka][None, :, None, None]
             + eo[kj][None, None, :, None] - ev[kb][None, None, None, :])
        tamp = v / d
        e = (jnp.einsum('iajb,iajb->', tamp, 2.0 * jnp.conj(v))
             - jnp.einsum('iajb,ibja->', tamp, jnp.conj(wx)))
        return e.real * t[4]                    # weight 0 for padding

    triples = []
    for ki in range(nk):
        for kj in range(nk):
            for ka in range(nk):
                triples.append((ki, kj, ka, int(kconserv[ki, kj, ka]), 1))
    triples = np.asarray(triples, dtype=np.int32)

    if mesh_dev is None:
        mesh_dev = Mesh(np.array(jax.devices()), ('kpt',))
    ndev = mesh_dev.devices.size
    npad = (-len(triples)) % ndev
    if npad:
        pad = np.zeros((npad, 5), dtype=np.int32)
        triples = np.concatenate([triples, pad])

    @partial(shard_map, mesh=mesh_dev, in_specs=(P('kpt'),),
             out_specs=P())
    def run(trip_shard):
        es = jax.lax.map(triple_energy, trip_shard)
        return jax.lax.psum(jnp.sum(es), 'kpt')

    e = jax.jit(run)(jnp.asarray(triples))
    return float(e) / nk ** 3
