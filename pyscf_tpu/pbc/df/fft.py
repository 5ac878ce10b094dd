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
    charges = {s: float(z) for s, z in zip(cell.elements_, cell.charges)}
    for symb in set(cell.elements_):
        pp = cell._pseudo.get(symb)
        if pp is None:
            # all-electron atom: bare point-charge Coulomb -4 pi Z / G^2,
            # G=0 dropped (jellium convention; cancels against Ewald)
            with np.errstate(divide='ignore'):
                vl = np.where(G2 > 1e-12,
                              -4.0 * np.pi * charges[symb]
                              / np.maximum(G2, 1e-30), 0.0)
            out[symb] = vl
            continue
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




def _gth_proj_combination(l, i):
    """Expansion of r^(2(i-1)) * (solid harmonic Y_lm) in cartesian
    monomials of degree l + 2(i-1): returns (nc_hi, 2l+1) matrix W with
    r^(2k) Y_lm = sum_c W[c, m] x^c. Exact (replaces the finite-difference
    d/dalpha trick: reference computes these in C, pyscf/pbc/gto/pseudo)."""
    import math
    from ...ops.integrals.cart2sph import cart2sph
    from ...ops.integrals.hermite import cart_components
    S = np.asarray(cart2sph(l))           # (2l+1, nc_l)
    k = i - 1
    ldeg = l + 2 * k
    hi = {c: idx for idx, c in enumerate(cart_components(ldeg))}
    W = np.zeros((len(hi), 2 * l + 1))
    carts_l = cart_components(l)
    for (kx, ky, kz) in [(a, b, k - a - b) for a in range(k + 1)
                         for b in range(k - a + 1)]:
        mult = math.factorial(k) // (math.factorial(kx) * math.factorial(ky)
                                     * math.factorial(kz))
        for ci, c in enumerate(carts_l):
            tgt = (c[0] + 2 * kx, c[1] + 2 * ky, c[2] + 2 * kz)
            W[hi[tgt], :] += mult * S[:, ci]
    return W


def _proj_ovlp_images(cell, l, i, rl, center, Ls):
    """<AO_mu | p_i^l at center+L> for every image L: (nL, nao, 2l+1).

    Exact analytic overlaps: the projector is a single unnormalized
    primitive e^(-r^2/(2 rl^2)) times the W-combination of degree
    l+2(i-1) cartesian monomials."""
    import math
    from scipy.special import gamma as _gamma
    from ...ops.integrals.int1e import ovlp_chunk
    from ...ops.integrals.cart2sph import cart2sph
    from ...ops.integrals.hermite import cart_components
    alpha = 0.5 / rl ** 2
    k = i - 1
    ldeg = l + 2 * k
    W = _gth_proj_combination(l, i)
    Ngth = math.sqrt(2.0) / (
        rl ** (l + (4.0 * i - 1.0) / 2.0)
        * math.sqrt(_gamma(l + (4.0 * i - 1.0) / 2.0)))
    nL = len(Ls)
    nao = cell.nao
    out = np.zeros((nL, nao, 2 * l + 1))
    centers = np.asarray(center)[None, :] + np.asarray(Ls)   # (nL, 3)
    for la, ga in cell.shell_groups.items():
        nsa, Ka = ga.exps.shape
        m = nsa * Ka * nL
        a = np.broadcast_to(ga.exps[:, :, None], (nsa, Ka, nL)).reshape(m)
        b = np.full(m, alpha)
        A = np.broadcast_to(ga.coords[:, None, None, :],
                            (nsa, Ka, nL, 3)).reshape(m, 3)
        B = np.broadcast_to(centers[None, None, :, :],
                            (nsa, Ka, nL, 3)).reshape(m, 3)
        w = np.broadcast_to(ga.coeffs[:, :, None], (nsa, Ka, nL)).reshape(m)
        blk = np.asarray(ovlp_chunk(la, ldeg, jnp.asarray(a),
                                    jnp.asarray(b), jnp.asarray(A),
                                    jnp.asarray(B), jnp.asarray(w)))
        blk = blk.reshape(nsa, Ka, nL, blk.shape[1], blk.shape[2]).sum(axis=1)
        Sa = np.asarray(cart2sph(la))
        # (nsa, nL, 2la+1, 2l+1)
        v = np.einsum('mp,axpq,qn->axmn', Sa, blk, W, optimize=True)
        ia = (ga.ao_off[:, None] + np.arange(2 * la + 1))
        for s in range(nsa):
            out[:, ia[s], :] += v[s]
    return Ngth * out


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
        """Nonlocal GTH part via exact analytic lattice-summed projector
        overlaps (see _proj_ovlp_images)."""
        cell = self.cell
        nao = cell.nao
        vnl = np.zeros((nao, nao))
        Ls = np.asarray(cell.get_lattice_Ls())
        for ia, symb in enumerate(cell.elements_):
            pp = cell._pseudo.get(symb)
            if pp is None:
                continue
            R = np.asarray(cell.coords[ia])
            for l, ch in enumerate(pp['nl']):
                h = np.asarray(ch['h'])
                if h.size == 0:
                    continue
                ni = h.shape[0]
                P = [_proj_ovlp_images(cell, l, i, ch['rl'], R,
                                       Ls).sum(axis=0)
                     for i in range(1, ni + 1)]
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


# ---------------------------------------------------------------------------
# k-point machinery (analog of reference pbc/df/fft_jk.py get_j_kpts:33 /
# get_k_kpts:181 and pbc/scf/khf.py integrals)
# ---------------------------------------------------------------------------

def eval_ao_kpts(cell, coords, kpts, deriv=0, rcut=None):
    """Bloch AOs phi_i^k(r) = sum_L e^{ikL} chi_i(r-L): (nk, [ncomp,] ng, nao)."""
    Ls = np.asarray(cell.get_lattice_Ls(rcut))
    kpts = np.asarray(kpts).reshape(-1, 3)
    coords = jnp.asarray(coords)
    out = None
    phases = np.exp(1j * (kpts @ Ls.T))            # (nk, nL)
    for il, L in enumerate(Ls):
        v = np.asarray(mol_eval_ao(cell, coords - jnp.asarray(L),
                                   deriv=deriv))
        contrib = phases[:, il].reshape(-1, *([1] * v.ndim)) * v[None]
        out = contrib if out is None else out + contrib
    return out


class KFFTDF(FFTDF):
    """FFT density fitting over a k-point mesh."""

    def __init__(self, cell, kpts):
        super().__init__(cell, kpts=np.asarray(kpts).reshape(-1, 3))
        self._ao_k = None

    @property
    def nkpts(self):
        return len(self.kpts)

    def _ao_on_grid_kpts(self):
        if self._ao_k is None:
            self._ao_k = eval_ao_kpts(self.cell, self.grids_coords,
                                      self.kpts, 0)
        return self._ao_k

    def _lattice_sum_1e_kpts(self, cross_fn):
        """Phase-weighted lattice sums: M_k = sum_L e^{ikL} M(0, L)."""
        cell = self.cell
        kpts = self.kpts
        Ls = np.asarray(cell.get_lattice_Ls())
        phases = np.exp(1j * (kpts @ Ls.T))
        out = None
        for il, L in enumerate(Ls):
            m2 = cell.copy()
            m2.set_geom_(np.asarray(cell.coords) + L)
            v = np.asarray(cross_fn(cell, m2))
            contrib = phases[:, il][:, None, None] * v[None]
            out = contrib if out is None else out + contrib
        return out

    def get_ovlp_kpts(self):
        from ...ops.integrals.int1e import int1e_ovlp_cross
        return self._lattice_sum_1e_kpts(int1e_ovlp_cross)

    def get_kin_kpts(self):
        from ...ops.integrals.int1e import int1e_kin_cross
        return self._lattice_sum_1e_kpts(int1e_kin_cross)

    def get_pp_kpts(self):
        """GTH pseudopotential per k: local on the grid + nonlocal."""
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
        ao_k = self._ao_on_grid_kpts()
        w = self.weight
        nk = self.nkpts
        nao = cell.nao
        vpp = np.zeros((nk, nao, nao), dtype=complex)
        for k in range(nk):
            vpp[k] = w * np.einsum('gi,g,gj->ij', ao_k[k].conj(), vloc_r,
                                   ao_k[k])
        vpp += self.get_pp_nl_kpts()
        return vpp

    def get_pp_nl_kpts(self):
        """Nonlocal GTH per k via exact phase-weighted projector overlaps."""
        cell = self.cell
        kpts = self.kpts
        nk = len(kpts)
        nao = cell.nao
        vnl = np.zeros((nk, nao, nao), dtype=complex)
        Ls = np.asarray(cell.get_lattice_Ls())
        phases = np.exp(1j * (kpts @ Ls.T))       # (nk, nL)
        for ia, symb in enumerate(cell.elements_):
            pp = cell._pseudo.get(symb)
            if pp is None:
                continue
            R = np.asarray(cell.coords[ia])
            for l, ch in enumerate(pp['nl']):
                h = np.asarray(ch['h'])
                if h.size == 0:
                    continue
                ni = h.shape[0]
                P = []
                for i in range(1, ni + 1):
                    ov = _proj_ovlp_images(cell, l, i, ch['rl'], R, Ls)
                    P.append(np.einsum('kx,xum->kum', phases, ov))
                for i in range(ni):
                    for j in range(ni):
                        if abs(h[i, j]) > 0:
                            vnl += h[i, j] * np.einsum('kum,kvm->kuv',
                                                       P[i], P[j].conj())
        return vnl

    def get_hcore_kpts(self):
        return self.get_kin_kpts() + self.get_pp_kpts()

    def get_jk_bands(self, dm_kpts, band_df):
        """J/K matrices at arbitrary band k-points from the SCF-mesh
        density (reference pbc/df/fft_jk.py get_j_kpts/get_k_kpts with
        kpts_band). Bra/ket AOs are at the band k-points; the density
        (J) and occupied orbitals (K) come from this object's SCF mesh.
        No exxdiv correction here (applied by the caller per reference
        pbc/df/df_jk.py _ewald_exxdiv_for_G0:1479 semantics)."""
        cell = self.cell
        mesh = self.mesh
        ngrid = np.prod(mesh)
        ao_k = self._ao_on_grid_kpts()            # SCF kpts
        ao_b = band_df._ao_on_grid_kpts()         # band kpts
        nk = self.nkpts
        nb = band_df.nkpts
        dm = np.asarray(dm_kpts)
        Gv = cell.get_Gv(mesh)
        w = self.weight
        nao = cell.nao
        coords = np.asarray(self.grids_coords)
        rho = np.zeros(ngrid)
        for k in range(nk):
            dmao = ao_k[k] @ dm[k]
            rho += np.einsum('gi,gi->g', dmao, ao_k[k].conj()).real
        rho /= nk
        G2 = np.einsum('ix,ix->i', Gv, Gv)
        coulG = np.where(G2 > 1e-12, 4.0 * np.pi / np.maximum(G2, 1e-30),
                         0.0)
        vr = np.fft.ifftn((coulG.reshape(mesh)
                           * np.fft.fftn(rho.reshape(mesh)))).real.ravel()
        vj = np.stack([w * np.einsum('gi,g,gj->ij', ao_b[b].conj(), vr,
                                     ao_b[b]) for b in range(nb)])
        vk = np.zeros((nb, nao, nao), dtype=complex)
        for k2 in range(nk):
            evals, evecs = np.linalg.eigh(dm[k2])
            keep = evals > 1e-10
            cocc = evecs[:, keep] * np.sqrt(np.maximum(evals[keep], 0.0))
            psi = ao_k[k2] @ cocc
            for b in range(nb):
                q = self.kpts[k2] - band_df.kpts[b]
                Gq2 = np.einsum('ix,ix->i', Gv + q, Gv + q)
                coulGq = np.where(Gq2 > 1e-12,
                                  4.0 * np.pi / np.maximum(Gq2, 1e-30),
                                  0.0).reshape(*mesh, 1)
                phase = np.exp(-1j * coords @ q)
                for o in range(psi.shape[1]):
                    u = (ao_b[b].conj() * (psi[:, o] * phase)[:, None])
                    uG = np.fft.fftn(u.reshape(*mesh, -1), axes=(0, 1, 2))
                    vu = np.fft.ifftn(uG * coulGq,
                                      axes=(0, 1, 2)).reshape(ngrid, -1)
                    vk[b] += (w / nk) * u.T @ vu.conj()
        return vj, vk

    def get_jk_kpts(self, dm_kpts, with_j=True, with_k=True):
        """FFT J/K over the k mesh (reference pbc/df/fft_jk.py:33,181)."""
        cell = self.cell
        mesh = self.mesh
        ngrid = np.prod(mesh)
        kpts = self.kpts
        nk = len(kpts)
        ao_k = self._ao_on_grid_kpts()
        dm = np.asarray(dm_kpts)
        Gv = cell.get_Gv(mesh)
        w = self.weight
        nao = cell.nao
        vj = vk = None
        if with_j:
            rho = np.zeros(ngrid)
            for k in range(nk):
                dmao = ao_k[k] @ dm[k]
                rho += np.einsum('gi,gi->g', dmao, ao_k[k].conj()).real
            rho /= nk
            G2 = np.einsum('ix,ix->i', Gv, Gv)
            coulG = np.where(G2 > 1e-12, 4.0 * np.pi / np.maximum(G2, 1e-30),
                             0.0)
            vr = np.fft.ifftn((coulG.reshape(mesh)
                               * np.fft.fftn(rho.reshape(mesh)))).real.ravel()
            vj = np.stack([w * np.einsum('gi,g,gj->ij', ao_k[k].conj(), vr,
                                         ao_k[k]) for k in range(nk)])
        if with_k:
            vk = np.zeros((nk, nao, nao), dtype=complex)
            coords = np.asarray(self.grids_coords)
            for k2 in range(nk):
                evals, evecs = np.linalg.eigh(dm[k2])
                keep = evals > 1e-10
                cocc = evecs[:, keep] * np.sqrt(
                    np.maximum(evals[keep], 0.0))
                psi = ao_k[k2] @ cocc                  # (ngrid, nocc)
                for k in range(nk):
                    q = kpts[k2] - kpts[k]
                    Gq2 = np.einsum('ix,ix->i', Gv + q, Gv + q)
                    coulGq = np.where(Gq2 > 1e-12,
                                      4.0 * np.pi / np.maximum(Gq2, 1e-30),
                                      0.0).reshape(*mesh, 1)
                    phase = np.exp(-1j * coords @ q)   # e^{-iqr}
                    for o in range(psi.shape[1]):
                        u = (ao_k[k].conj() * (psi[:, o] * phase)[:, None])
                        uG = np.fft.fftn(u.reshape(*mesh, -1), axes=(0, 1, 2))
                        vu = np.fft.ifftn(uG * coulGq,
                                          axes=(0, 1, 2)).reshape(ngrid, -1)
                        vk[k] += (w / nk) * u.T @ vu.conj()
        return vj, vk
