"""FFT-based plane-wave density fitting (Gamma point).

Analog of reference pyscf/pbc/df/fft.py (FFTDF:185) + fft_jk.py
(get_j_kpts:33) + pseudo/pp.py GTH evaluation. jnp.fft maps directly onto
the TPU; lattice-summed AO values feed dense grid contractions (MXU).
"""
import numpy as np
import jax
import jax.numpy as jnp

from ...ops.eval_gto import eval_ao as mol_eval_ao


def eval_ao_periodic(cell, coords, deriv=0, rcut=None):
    """Lattice-summed AO values on real-space points (Gamma point)."""
    Ls = cell.get_lattice_Ls(rcut)
    coords = jnp.asarray(coords)
    out = None
    for L in Ls:
        shifted = coords - jnp.asarray(L)
        v = mol_eval_ao(cell, shifted, deriv=deriv)
        out = v if out is None else out + v
    return out


def _gth_vlocG(cell, G2):
    """Local GTH pseudopotential in G space, per atom type.

    Returns dict symb -> (ngrid,) with the attractive sign convention;
    G=0 entry holds the regularized (alpha) term. MH (4.79) / PRB 58, 3641.
    """
    out = {}
    for symb in set(cell.elements_):
        pp = cell._pseudo[symb]
        zion = float(sum(pp['nelec']))
        rloc = pp['rloc']
        c = list(pp['cloc']) + [0.0] * (4 - len(pp['cloc']))
        g2r = G2 * rloc ** 2
        expf = np.exp(-0.5 * g2r)
        with np.errstate(divide='ignore', invalid='ignore'):
            vl = -4.0 * np.pi * zion / G2 * expf
        cfacs = (c[0]
                 + c[1] * (3.0 - g2r)
                 + c[2] * (15.0 - 10.0 * g2r + g2r ** 2)
                 + c[3] * (105.0 - 105.0 * g2r + 21.0 * g2r ** 2 - g2r ** 3))
        vl = vl + (2.0 * np.pi) ** 1.5 * rloc ** 3 * expf * cfacs
        # G = 0: regularized limit of 4 pi Z/G^2 (1 - exp(-G^2 rloc^2/2))
        g0 = 2.0 * np.pi * zion * rloc ** 2 \
            + (2.0 * np.pi) ** 1.5 * rloc ** 3 * c[0] \
            + (2.0 * np.pi) ** 1.5 * rloc ** 3 * (3.0 * c[1] + 15.0 * c[2]
                                                  + 105.0 * c[3])
        vl = np.where(G2 < 1e-12, g0, vl)
        out[symb] = vl
    return out


def _gth_projectors(cell, coords):
    """GTH nonlocal projector values on the grid (lattice-summed).

    Returns list of (values (ngrid,), hfac) grouped as
    [(h_block, [proj_i values...]) per (atom, l)]; each proj value array has
    a trailing m axis folded in: (ngrid, 2l+1).
    """
    import math
    from scipy.special import gamma as _gamma
    coords = np.asarray(coords)
    from ...ops.integrals.cart2sph import cart2sph
    from ...ops.integrals.hermite import cart_components
    Ls = np.asarray(cell.get_lattice_Ls(min(cell.rcut, 8.0)))
    blocks = []
    for ia, symb in enumerate(cell.elements_):
        pp = cell._pseudo[symb]
        R = cell.coords[ia]
        for l, ch in enumerate(pp['nl']):
            h = np.asarray(ch['h'])
            if h.size == 0:
                continue
            rl = ch['rl']
            ni = h.shape[0]
            projs = []
            for i in range(1, ni + 1):
                # p_i^l(r) = N r^(l+2i-2) exp(-r^2/(2 rl^2)) Y_lm
                N = math.sqrt(2.0) / (
                    rl ** (l + (4.0 * i - 1.0) / 2.0)
                    * math.sqrt(_gamma(l + (4.0 * i - 1.0) / 2.0)))
                vals = np.zeros((coords.shape[0], 2 * l + 1))
                S = cart2sph(l)
                carts = cart_components(l)
                for L in Ls:
                    d = coords - (R + L)
                    r2 = np.einsum('gi,gi->g', d, d)
                    rad = N * np.exp(-0.5 * r2 / rl ** 2) \
                        * r2 ** (i - 1)
                    mono = np.stack([d[:, 0] ** a * d[:, 1] ** b
                                     * d[:, 2] ** c
                                     for (a, b, c) in carts], axis=1)
                    vals += (mono * rad[:, None]) @ S.T
                projs.append(vals)
            blocks.append((h, projs))
    return blocks


class FFTDF:
    def __init__(self, cell, kpts=None):
        self.cell = cell
        self.kpts = kpts
        self.mesh = cell.mesh
        self._ao = None       # cached AO values on the grid
        self._aod = None

    @property
    def grids_coords(self):
        return self.cell.get_uniform_grids(self.mesh)

    def _ao_on_grid(self, deriv=0):
        if deriv == 0:
            if self._ao is None:
                self._ao = eval_ao_periodic(self.cell, self.grids_coords, 0)
            return self._ao
        if self._aod is None:
            self._aod = eval_ao_periodic(self.cell, self.grids_coords, 1)
            self._ao = self._aod[0]
        return self._aod

    @property
    def weight(self):
        return self.cell.vol / np.prod(self.mesh)

    def get_ovlp(self):
        """Lattice-summed analytic overlap."""
        from ...ops.integrals.int1e import int1e_ovlp_cross
        return self._lattice_sum_1e(int1e_ovlp_cross)

    def get_kin(self):
        from ...ops.integrals.int1e import int1e_kin_cross
        return self._lattice_sum_1e(int1e_kin_cross)

    def _lattice_sum_1e(self, cross_fn):
        cell = self.cell
        out = None
        for L in cell.get_lattice_Ls():
            m2 = cell.copy()
            m2.set_geom_(np.asarray(cell.coords) + L)
            v = np.asarray(cross_fn(cell, m2))
            out = v if out is None else out + v
        return jnp.asarray(out)

    def get_pp(self):
        """GTH pseudopotential matrix (local + nonlocal), Gamma point."""
        cell = self.cell
        mesh = self.mesh
        ngrid = np.prod(mesh)
        Gv = cell.get_Gv(mesh)
        G2 = np.einsum('ix,ix->i', Gv, Gv)
        vlocG_tab = _gth_vlocG(cell, G2)
        SIv = np.zeros(ngrid, dtype=complex)
        for ia, symb in enumerate(cell.elements_):
            SI = np.exp(-1j * Gv @ cell.coords[ia])
            SIv += SI * vlocG_tab[symb]
        vloc_r = np.fft.ifftn(SIv.reshape(mesh)).real * (ngrid / cell.vol)
        vloc_r = vloc_r.ravel()
        ao = np.asarray(self._ao_on_grid(0))
        w = self.weight
        vpp = w * np.einsum('gi,g,gj->ij', ao, vloc_r, ao)
        vpp = vpp + np.asarray(self.get_pp_nl())
        return jnp.asarray(vpp)

    def get_pp_nl(self):
        """Nonlocal GTH part via analytic lattice-summed projector overlaps.

        <mu|p_i^lm>: the i=1 projector is a plain Gaussian shell; i>=2 carry
        r^(2(i-1)) prefactors obtained by -d/dalpha of the analytic overlap
        (central finite difference in the exponent).
        """
        import math
        from scipy.special import gamma as _gamma
        from ...gto.mole import Mole, gto_norm
        from ...ops.integrals.int1e import int1e_ovlp_cross
        cell = self.cell
        nao = cell.nao
        vnl = np.zeros((nao, nao))
        Ls = cell.get_lattice_Ls(min(cell.rcut, 10.0))

        def proj_ovlp(l, alpha, center):
            """Lattice-summed <mu|[normalized single-prim shell]>, (nao, 2l+1)."""
            out = None
            for L in Ls:
                pm = Mole(atom=[('X', center + L)],
                          basis={'X': [[l, [alpha, 1.0]]]}, unit='bohr',
                          verbose=0)
                pm.build()
                v = np.asarray(int1e_ovlp_cross(cell, pm))
                out = v if out is None else out + v
            return out

        for ia, symb in enumerate(cell.elements_):
            pp = cell._pseudo[symb]
            R = np.asarray(cell.coords[ia])
            for l, ch in enumerate(pp['nl']):
                h = np.asarray(ch['h'])
                if h.size == 0:
                    continue
                rl = ch['rl']
                alpha = 0.5 / rl ** 2
                ni = h.shape[0]
                P = []
                for i in range(1, ni + 1):
                    Ngth = math.sqrt(2.0) / (
                        rl ** (l + (4.0 * i - 1.0) / 2.0)
                        * math.sqrt(_gamma(l + (4.0 * i - 1.0) / 2.0)))
                    if i == 1:
                        ov = proj_ovlp(l, alpha, R) / gto_norm(l, alpha)
                        P.append(Ngth * ov)
                    else:
                        # r^(2(i-1)) e^(-a r^2) = (-d/da)^(i-1) e^(-a r^2)
                        k = i - 1
                        hstep = alpha * 1e-4
                        pts = [alpha + (j - k) * hstep
                               for j in range(2 * k + 1)]
                        vals = [proj_ovlp(l, a_, R) / gto_norm(l, a_)
                                for a_ in pts]
                        # central fd for k-th derivative
                        coef = _fd_coeffs(k, 2 * k + 1, hstep)
                        ov = sum(c * v for c, v in zip(coef, vals))
                        P.append(((-1.0) ** k) * Ngth * ov)
                for i in range(ni):
                    for j in range(ni):
                        if abs(h[i, j]) > 0:
                            vnl += h[i, j] * np.einsum('um,vm->uv',
                                                       P[i], P[j])
        return vnl

    def get_hcore(self):
        return self.get_kin() + self.get_pp()

    def get_jk(self, dm, with_j=True, with_k=True, exxdiv=None):
        cell = self.cell
        mesh = self.mesh
        ngrid = np.prod(mesh)
        ao = np.asarray(self._ao_on_grid(0))
        dm = np.asarray(dm)
        Gv = cell.get_Gv(mesh)
        G2 = np.einsum('ix,ix->i', Gv, Gv)
        with np.errstate(divide='ignore'):
            coulG = np.where(G2 > 1e-12, 4.0 * np.pi / G2, 0.0)
        w = self.weight
        vj = vk = None
        # with rho_G = w FFT[rho] and V = (N/vol) IFFT[coulG rho_G],
        # the prefactors cancel: V(r) = IFFT[coulG * FFT[rho]].
        if with_j:
            rho = np.einsum('gi,ij,gj->g', ao, dm, ao)
            vr = np.fft.ifftn(
                (coulG.reshape(mesh)
                 * np.fft.fftn(rho.reshape(mesh)))).real.ravel()
            vj = w * np.einsum('gi,g,gj->ij', ao, vr, ao)
        if with_k:
            # K_ij = sum_occ int phi_i psi_o v[phi_j psi_o]
            evals, evecs = np.linalg.eigh(dm)
            keep = evals > 1e-10
            cocc = evecs[:, keep] * np.sqrt(np.maximum(evals[keep], 0.0))
            aoc = ao @ cocc                       # (ngrid, nocc)
            vk = np.zeros_like(dm)
            for o in range(aoc.shape[1]):
                pair = ao * aoc[:, o][:, None]    # (ngrid, nao)
                pairG = np.fft.fftn(pair.reshape(*mesh, -1), axes=(0, 1, 2))
                vpair = np.fft.ifftn(
                    pairG * coulG.reshape(*mesh, 1),
                    axes=(0, 1, 2)).real.reshape(ngrid, -1)
                vk += w * pair.T @ vpair
        return (jnp.asarray(vj) if vj is not None else None,
                jnp.asarray(vk) if vk is not None else None)


def _fd_coeffs(k, npts, h):
    """Central finite-difference weights for the k-th derivative."""
    import math
    offsets = np.arange(npts) - (npts - 1) // 2
    A = np.vander(offsets * h, npts, increasing=True).T
    b = np.zeros(npts)
    b[k] = math.factorial(k)
    return np.linalg.solve(A, b)
