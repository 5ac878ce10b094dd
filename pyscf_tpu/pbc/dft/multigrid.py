"""GPW multigrid for periodic J / Vxc builds (Γ point).

Analog of the reference's pbc/dft/multigrid/multigrid.py (nr_rks:1069,
C collocation lib/dft/multigrid.c), redesigned around device FFTs:

- every shell PAIR is assigned the COARSEST uniform mesh that still
  resolves its product Gaussian (sharpness alpha_i + alpha_j against the
  mesh's kinetic-energy cutoff, the same criterion Cell.build uses for
  its single mesh),
- each level's partial density rho_l is collocated with only that
  level's AO values (ngrid_l x nao_l work instead of ngrid_fine x nao),
- the level densities are summed in G space by zero-padded prolongation
  onto the finest mesh, the Coulomb (and XC) problem is solved there
  once, and the potential is restricted back to each level's G set for
  the per-level matrix quadrature.

Everything is dense batched FFT/matmul — no per-shell scatter loops.
"""
import numpy as np
import jax.numpy as jnp

from ..df.fft import FFTDF, eval_ao_periodic


def _level_meshes(cell, nlevels=3, rel_cutoff=4.0):
    """Geometric mesh ladder [finest, ..., coarsest] and their ke cutoffs.

    rel_cutoff guards the assignment: a pair lands on a level only if the
    level's ke_cutoff exceeds rel_cutoff x the pair's own requirement."""
    fine = np.asarray(cell.mesh)
    meshes = []
    m = fine.copy()
    for _ in range(nlevels):
        meshes.append(m.copy())
        m = np.maximum((m // 2) | 1, 5)      # halve, keep odd, floor 5
    # ke cutoff of a mesh: smallest Nyquist G over the 3 axes
    b = cell.reciprocal_vectors()
    kes = []
    for m in meshes:
        gmax = np.min((m // 2) * np.linalg.norm(b, axis=1))
        kes.append(0.5 * gmax * gmax)
    return meshes, np.asarray(kes)


def _shell_alpha_max(cell):
    """Per-AO max contraction exponent (sharpness measure)."""
    amax = np.zeros(cell.nao)
    for l, g in cell.shell_groups.items():
        for s in range(g.nshl):
            e = np.asarray(g.exps[s])[np.asarray(g.coeffs[s]) != 0]
            off = g.ao_off[s]
            amax[off:off + 2 * l + 1] = e.max() if e.size else 0.0
    return amax


def _g_subset_idx(fine_mesh, coarse_mesh):
    """Indices of the coarse mesh's frequencies inside the fine G grid,
    per axis (for zero-padded prolongation / truncation restriction)."""
    idx = []
    for n, N in zip(coarse_mesh, fine_mesh):
        k = np.fft.fftfreq(n, 1.0 / n).astype(int)      # signed freqs
        idx.append(np.mod(k, N))
    return idx


class MultiGridFFTDF(FFTDF):
    """Drop-in FFTDF with multigrid J and multigrid XC quadrature."""

    nlevels = 3
    # pair resolved on a level when ke_level >= ke_factor * (ai+aj) * ln(1/prec)
    ke_factor = 1.0

    def __init__(self, cell, kpts=None, nlevels=3):
        super().__init__(cell, kpts)
        self.nlevels = nlevels
        self._levels = None

    def _build_levels(self):
        if self._levels is not None:
            return self._levels
        cell = self.cell
        meshes, kes = _level_meshes(cell, self.nlevels)
        amax = _shell_alpha_max(cell)
        pair_sharp = amax[:, None] + amax[None, :]
        logp = -np.log(cell.precision)
        # required ke per pair (Cell.build's own mesh rule)
        ke_req = self.ke_factor * 2.0 * pair_sharp / 2.0 * logp
        # assignment: coarsest level that resolves the pair
        lvl = np.zeros(ke_req.shape, dtype=int)          # 0 = finest
        for li in range(1, len(meshes)):
            lvl = np.where(kes[li] >= ke_req, li, lvl)
        levels = []
        for li, m in enumerate(meshes):
            pair_mask = lvl == li
            if not pair_mask.any():
                continue
            aos = np.where(pair_mask.any(axis=1))[0]
            coords = cell.get_uniform_grids(m)
            ao = np.asarray(eval_ao_periodic(cell, coords, 0))[:, aos]
            levels.append(dict(mesh=m, mask=pair_mask, aos=aos, ao=ao,
                               gidx=_g_subset_idx(cell.mesh, m),
                               weight=cell.vol / np.prod(m)))
        self._levels = levels
        return levels

    # -- density: collocate per level, prolongate in G -------------------
    def _rho_G(self, dm):
        cell = self.cell
        fine = cell.mesh
        rhoG = np.zeros(tuple(fine), dtype=complex)
        dm = np.asarray(dm)
        for lv in self._build_levels():
            sub = dm[np.ix_(lv['aos'], lv['aos'])] * \
                lv['mask'][np.ix_(lv['aos'], lv['aos'])]
            rho = np.einsum('gi,ij,gj->g', lv['ao'], sub, lv['ao'])
            g = np.fft.fftn(rho.reshape(tuple(lv['mesh']))) \
                * (lv['weight'] / cell.vol * np.prod(fine))
            ix, iy, iz = lv['gidx']
            rhoG[np.ix_(ix, iy, iz)] += g
        # rhoG normalized so that ifftn(rhoG) = rho on the fine mesh
        return rhoG

    # -- potential: restrict per level, integrate on that level ----------
    def _vmat_from_vG(self, vG):
        """AO matrix of the potential given its fine-mesh FFT (with the
        same normalization as np.fft.fftn of point values)."""
        cell = self.cell
        fine = np.prod(cell.mesh)
        nao = cell.nao
        out = np.zeros((nao, nao))
        for lv in self._build_levels():
            ix, iy, iz = lv['gidx']
            sub = vG[np.ix_(ix, iy, iz)] * (np.prod(lv['mesh']) / fine)
            v_r = np.fft.ifftn(sub).real.ravel()
            m = lv['weight'] * np.einsum('gi,g,gj->ij', lv['ao'], v_r,
                                         lv['ao'])
            blk = np.zeros((nao, nao))
            blk[np.ix_(lv['aos'], lv['aos'])] = m
            out += blk * lv['mask']
        return out

    def get_j_multigrid(self, dm):
        cell = self.cell
        Gv = cell.get_Gv(cell.mesh)
        G2 = np.einsum('ix,ix->i', Gv, Gv)
        coulG = np.where(G2 > 1e-12, 4.0 * np.pi / np.maximum(G2, 1e-30),
                         0.0).reshape(tuple(cell.mesh))
        rhoG = self._rho_G(dm)
        vG = coulG * rhoG
        vj = self._vmat_from_vG(vG)
        ej = 0.5 * float(np.sum(vj * np.asarray(dm)))
        return jnp.asarray(vj), ej

    def get_rho_fine(self, dm):
        """Total density on the finest real-space mesh (for XC)."""
        return np.fft.ifftn(self._rho_G(dm)).real.ravel()

    def get_veff_rks(self, dm, xc):
        """Multigrid J + LDA/GGA XC on the prolongated fine density.

        Returns (vhf, ej, exc)."""
        import jax
        cell = self.cell
        mesh = tuple(cell.mesh)
        vj, ej = self.get_j_multigrid(dm)
        rho_r = np.maximum(self.get_rho_fine(dm), 0.0)
        from ...dft import xc as xc_mod
        xco = xc_mod.parse_xc(xc) if isinstance(xc, str) else xc
        w = self.weight
        if xco.is_gga:
            # gradient of rho in G space (exact on the fine mesh)
            Gv = cell.get_Gv(cell.mesh)
            rhoG = np.fft.fftn(rho_r.reshape(mesh))
            grad = [np.fft.ifftn((1j * Gv[:, d].reshape(mesh)) * rhoG).real
                    for d in range(3)]
            sigma = sum(g * g for g in grad)
            sigma = np.ravel(sigma)
        else:
            sigma = np.zeros_like(rho_r)

        def edens(r, s):
            ra = 0.5 * r
            s4 = 0.25 * s
            return xco.exc_density(ra, ra, s4, s4, s4)

        from ...dft.numint import _masked
        mask, r_s, s_s = _masked(jnp.asarray(rho_r), jnp.asarray(sigma))
        exc = float(jnp.sum(jnp.where(
            mask, w * edens(r_s, s_s), 0.0)))
        vr, vs = jax.grad(lambda r, s: jnp.sum(edens(r, s)),
                          argnums=(0, 1))(r_s, s_s)
        vr = np.where(np.asarray(mask), np.asarray(vr), 0.0)
        # V_xc(r) = vrho - 2 div(vsigma grad rho)  (GGA, in G space)
        vxc_r = vr
        if xco.is_gga:
            vs = np.where(np.asarray(mask), np.asarray(vs), 0.0)
            Gv = cell.get_Gv(cell.mesh)
            div = np.zeros(mesh)
            for d in range(3):
                fd = np.fft.fftn((vs * 2.0 * np.ravel(grad[d])
                                  ).reshape(mesh))
                div += np.fft.ifftn(1j * Gv[:, d].reshape(mesh) * fd).real
            vxc_r = vxc_r - div.ravel()
        vxcG = np.fft.fftn(vxc_r.reshape(mesh))
        vxc = self._vmat_from_vG(vxcG)
        vhf = vj + jnp.asarray(vxc)
        return vhf, ej, exc
