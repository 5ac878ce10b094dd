"""k-point MP2 over a KRHF reference.

Reference analog: pyscf/pbc/mp/kmp2.py (kernel:~60). The reference builds
(ia|jb) k-blocks through its periodic ao2mo/df machinery; here each MO-ERI
block is two batched FFTs (pair densities -> G-space Coulomb -> back) and
one dense GEMM over the grid axis — all MXU/FFT-friendly XLA ops.

Energy per cell:
  E = 1/nk^3 sum_{ki kj ka} sum_{iajb} V[2 V* - W*] / (ei+ej-ea-eb)
with V = (i_ki a_ka | j_kj b_kb), kb fixed by crystal momentum
conservation, and all MO pair densities sampled on the FFT mesh.
"""
import jax.numpy as jnp
import numpy as np


def _member(kpt, kpts, tol=1e-8):
    d = np.linalg.norm(kpts - kpt[None], axis=1)
    i = int(np.argmin(d))
    assert d[i] < tol, f'kpt {kpt} not in mesh'
    return i


def kconserve_index(cell, kpts):
    """kconserv[ki, kj, ka] = kb index with ki - ka + kj - kb in G."""
    nk = len(kpts)
    b = cell.reciprocal_vectors_
    binv = np.linalg.inv(b)
    out = np.zeros((nk, nk, nk), dtype=np.int32)
    for i in range(nk):
        for j in range(nk):
            for a in range(nk):
                kb = kpts[i] - kpts[a] + kpts[j]
                # fold back into the mesh
                frac = kb @ binv
                frac = frac - np.round(frac)
                best = None
                for k in range(nk):
                    df = (kpts[k] @ binv) - frac
                    if np.linalg.norm(df - np.round(df)) < 1e-8:
                        best = k
                        break
                assert best is not None, 'momentum not conserved on mesh'
                out[i, j, a] = best
    return out


def eri_block(cell, ao_k, kpts, mo1, k1, mo2, k2, mo3, k3, mo4, k4,
              mesh=None):
    """(m1 m2 | m3 m4) chemist-notation MO ERIs at fixed k-points.

    mo* are (nao, n*) coefficient blocks at kpts[k*]; requires
    (k2-k1) + (k4-k3) in the reciprocal lattice. Returns (n1,n2,n3,n4)
    complex.
    """
    mesh = mesh or cell.mesh
    ngrid = int(np.prod(mesh))
    w = cell.vol / ngrid
    coords = np.asarray(cell.get_uniform_grids(mesh))
    Gv = np.asarray(cell.get_Gv(mesh))

    q12 = kpts[k2] - kpts[k1]
    q34 = kpts[k4] - kpts[k3]

    psi1 = jnp.asarray(ao_k[k1]) @ jnp.asarray(mo1)     # (g, n1)
    psi2 = jnp.asarray(ao_k[k2]) @ jnp.asarray(mo2)
    psi3 = jnp.asarray(ao_k[k3]) @ jnp.asarray(mo3)
    psi4 = jnp.asarray(ao_k[k4]) @ jnp.asarray(mo4)

    phase12 = jnp.exp(-1j * jnp.asarray(coords @ q12))
    phase34 = jnp.exp(-1j * jnp.asarray(coords @ q34))
    # G0 = -(q12 + q34) is a reciprocal vector; e^{-iG0 r} is periodic
    phase_g0 = jnp.exp(1j * jnp.asarray(coords @ (q12 + q34)))

    # periodic pair densities
    p12 = (psi1.conj()[:, :, None] * psi2[:, None, :]
           * phase12[:, None, None])                    # (g, n1, n2)
    p34 = (psi3.conj()[:, :, None] * psi4[:, None, :]
           * phase34[:, None, None])

    Gq2 = np.einsum('ix,ix->i', Gv + q12, Gv + q12)
    coulG = np.where(Gq2 > 1e-12, 4.0 * np.pi / np.maximum(Gq2, 1e-30), 0.0)
    coulG = jnp.asarray(coulG.reshape(*mesh, 1, 1))

    pG = jnp.fft.fftn(p12.reshape(*mesh, *p12.shape[1:]), axes=(0, 1, 2))
    v12 = jnp.fft.ifftn(pG * coulG, axes=(0, 1, 2)).reshape(ngrid, -1)

    right = (p34 * phase_g0[:, None, None]).reshape(ngrid, -1)
    out = w * (v12.T @ right)
    n1, n2 = p12.shape[1:]
    n3, n4 = p34.shape[1:]
    return np.asarray(out).reshape(n1, n2, n3, n4)


def kernel(mf):
    """MP2 correlation energy per cell for a converged KRHF."""
    cell = mf.cell
    kpts = np.asarray(mf.kpts)
    nk = len(kpts)
    ao_k = mf.with_df._ao_on_grid_kpts()
    kconserv = kconserve_index(cell, kpts)

    occs, virts, eo, ev = [], [], [], []
    for k in range(nk):
        o = np.asarray(mf.mo_occ[k]) > 0
        c = np.asarray(mf.mo_coeff[k])
        e = np.asarray(mf.mo_energy[k])
        occs.append(c[:, o])
        virts.append(c[:, ~o])
        eo.append(e[o])
        ev.append(e[~o])

    emp2 = 0.0
    for ki in range(nk):
        for kj in range(nk):
            for ka in range(nk):
                kb = int(kconserv[ki, kj, ka])
                v = eri_block(cell, ao_k, kpts, occs[ki], ki, virts[ka], ka,
                              occs[kj], kj, virts[kb], kb)
                wx = eri_block(cell, ao_k, kpts, occs[ki], ki, virts[kb], kb,
                               occs[kj], kj, virts[ka], ka)
                d = (eo[ki][:, None, None, None] - ev[ka][None, :, None, None]
                     + eo[kj][None, None, :, None]
                     - ev[kb][None, None, None, :])
                t = v / d
                emp2 += np.einsum('iajb,iajb->', t, 2.0 * v.conj()).real
                emp2 -= np.einsum('iajb,ibja->', t, wx.conj()).real
    return emp2 / nk**3


class KMP2:
    """MP2 on a k-point mesh (reference pbc/mp/kmp2.py KMP2)."""

    def __init__(self, mf):
        self._scf = mf
        self.cell = mf.cell
        self.kpts = mf.kpts
        self.e_corr = None

    def kernel(self):
        self.e_corr = kernel(self._scf)
        self.e_tot = float(self._scf.e_tot) + self.e_corr
        return self.e_corr, None

    @property
    def e_hf(self):
        return self._scf.e_tot
