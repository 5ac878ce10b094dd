"""Numerical XC integration (analog of reference pyscf/dft/numint.py:
nr_rks:1074, eval_rho:116, eval_mat:557).

One jitted program per (molecule, functional family) evaluates the whole
grid in fixed-size blocks via lax.scan: AO values -> density -> XC energy
density -> Vxc matrix accumulation. Potentials come from jax.grad of the
energy density (replacing libxc's derivative tables). Small-density points
are masked with safe inputs so autodiff never sees 0^(-1/3).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.eval_gto import eval_ao
from . import xc as xc_mod

BLK = 4096
# Per-block AO-value budget (elements of the (4, blk, nao) f64 block,
# ~240 MB): blocks are sized as LARGE as memory allows so the XC
# quadrature is a few big MXU matmuls instead of many small scan steps.
BLK_ELEM_BUDGET = 3.0e7
# TPU f64 is emulated as a double-f32 pair with f32's exponent range, so
# densities below ~1e-10 drive rho^(-1/3)/exp intermediates out of range
# (NaN on TPU, fine on CPU). Threshold + clamps keep every live point
# inside the representable range on both backends; the dropped tail
# contributes < 1e-9 Ha on standard grids.
RHO_THR = 1e-10
SIGMA_FLOOR = 1e-20


def choose_blk(n, nao=None):
    """Grid block size: as big as the AO-block memory budget allows,
    in BLK granularity, never more than one block beyond the grid."""
    if nao is None:
        return BLK
    cap = max(1, int(BLK_ELEM_BUDGET / (4 * max(nao, 1)) / BLK)) * BLK
    need = -(-n // BLK) * BLK          # grid rounded up to granularity
    return min(cap, need)


def _pad_grid(coords, weights, blk=None, nao=None):
    n = coords.shape[0]
    if blk is None:
        blk = choose_blk(n, nao)
    nblk = -(-n // blk)
    pad = nblk * blk - n
    coords = jnp.pad(coords, ((0, pad), (0, 0)))
    weights = jnp.pad(weights, (0, pad))
    return coords.reshape(nblk, blk, 3), weights.reshape(nblk, blk)


def _floors(dtype):
    """(rho_thr, sigma_floor) for the working dtype: the f64 values are
    subnormal-adjacent in f32 (1e-20 flushes to zero; its reverse-mode
    1/sigma then hits inf), which NaN'd the fused-SCF f32 pre-stage for
    every GGA."""
    if dtype == jnp.float32:
        return 1e-6, 1e-12
    return RHO_THR, SIGMA_FLOOR


def _masked(rho, sigma):
    rho_thr, sig_floor = _floors(rho.dtype)
    mask = rho > rho_thr
    rho_s = jnp.where(mask, jnp.maximum(rho, rho_thr), 1.0)
    sigma_s = jnp.where(mask, jnp.maximum(sigma, sig_floor), 1.0)
    return mask, rho_s, sigma_s


class NumInt:
    """Restricted/unrestricted numerical integrator."""

    def __init__(self):
        self._cache = {}

    # -------------------------------------------------------------
    def nr_rks(self, mol, grids, xc_code, dm, max_memory=None):
        """Returns (nelec, exc, vxc_matrix) for a closed-shell density."""
        fn = self._get_rks_fn(mol, xc_code)
        coords, weights = _pad_grid(grids.coords, grids.weights, nao=mol.nao)
        n, exc, vmat = fn(coords, weights, dm)
        return float(n), float(exc), vmat

    def nr_uks(self, mol, grids, xc_code, dm, max_memory=None):
        fn = self._get_uks_fn(mol, xc_code)
        coords, weights = _pad_grid(grids.coords, grids.weights, nao=mol.nao)
        n, exc, vmat = fn(coords, weights, dm)
        return np.asarray(n), float(exc), vmat

    # -------------------------------------------------------------
    @staticmethod
    def aod_program(mol, deriv):
        """Jitted scan evaluating AO values (+derivs) on blocked grid
        coords; compiled once per (mol, deriv) and cached on the Mole.
        AO values are density-independent, so the fused SCF program takes
        them as an input instead of re-evaluating every cycle."""
        cache = getattr(mol, '_aod_prog_cache', None)
        if cache is None:
            cache = mol._aod_prog_cache = {}
        if deriv not in cache:
            @jax.jit
            def run(coords):
                def block(carry, c):
                    return carry, eval_ao(mol, c, deriv=deriv)
                _, ys = jax.lax.scan(block, 0, coords)
                return ys
            cache[deriv] = run
        return cache[deriv]

    def grid_ao(self, mol, grids, deriv):
        """(aod, weights) blocked for the fused path: aod is
        (nblk, blk, nao) for LDA or (nblk, 4, blk, nao) for GGA."""
        coords, weights = _pad_grid(grids.coords, grids.weights, nao=mol.nao)
        aod = self.aod_program(mol, deriv)(coords)
        return aod, weights

    def _get_rks_core_aod(self, mol, xc_code):
        """Traceable (aod, weights, dm) -> (n, exc, vmat) over precomputed
        AO blocks (the per-cycle XC cost is then pure matmuls)."""
        key = (id(mol), xc_code, 'r-aod')
        if key in self._cache:
            return self._cache[key]
        xc = xc_mod.parse_xc(xc_code)
        mgga = xc.is_mgga
        deriv = 1 if (xc.is_gga or mgga) else 0

        def edens_closed(rho, sigma, tau):
            ra = 0.5 * rho
            s4 = 0.25 * sigma
            if mgga:
                return xc.exc_density(ra, ra, s4, s4, s4, 0.5 * tau,
                                      0.5 * tau)
            return xc.exc_density(ra, ra, s4, s4, s4)

        exc_grad = jax.grad(
            lambda r, s, t: jnp.sum(edens_closed(r, s, t)),
            argnums=(0, 1, 2))

        def run(aod_blocks, weights, dm):
            def block(carry, xw):
                n_acc, e_acc, v_acc = carry
                aod, w = xw
                if deriv == 0:
                    ao = aod
                else:
                    ao = aod[0]
                dmao = ao @ dm
                rho = jnp.maximum(jnp.einsum('bi,bi->b', dmao, ao), 0.0)
                if deriv == 0:
                    sigma = jnp.zeros_like(rho)
                    tau = jnp.zeros_like(rho)
                else:
                    grho = 2.0 * jnp.einsum('bi,dbi->db', dmao, aod[1:])
                    sigma = jnp.einsum('db,db->b', grho, grho)
                    if mgga:
                        dmaod = jnp.einsum('dbi,ij->dbj', aod[1:], dm)
                        tau = 0.5 * jnp.einsum('dbi,dbi->b', dmaod, aod[1:])
                    else:
                        tau = jnp.zeros_like(rho)
                mask, rho_s, sigma_s = _masked(rho, sigma)
                tau_s = jnp.where(mask, jnp.maximum(tau, 1e-20), 1.0)
                e_blk = jnp.sum(jnp.where(
                    mask, w * edens_closed(rho_s, sigma_s, tau_s), 0.0))
                vrho, vsigma, vtau = exc_grad(rho_s, sigma_s, tau_s)
                wv = jnp.where(mask, w * vrho, 0.0)
                if deriv == 0:
                    v_blk = jnp.einsum('b,bi,bj->ij', 0.5 * wv, ao, ao)
                else:
                    wvs = jnp.where(mask, w * vsigma, 0.0)
                    vtmp = 0.5 * wv[:, None] * ao \
                        + 2.0 * jnp.einsum('b,db,dbi->bi', wvs, grho,
                                           aod[1:])
                    v_blk = ao.T @ vtmp
                    if mgga:
                        wvt = jnp.where(mask, w * vtau, 0.0)
                        v_blk = v_blk + 0.25 * jnp.einsum(
                            'dbi,b,dbj->ij', aod[1:], wvt, aod[1:])
                n_blk = jnp.sum(w * rho)
                return (n_acc + n_blk, e_acc + e_blk, v_acc + v_blk), None

            nao = dm.shape[-1]
            dt = dm.dtype
            # zero seeded from the scanned input: under shard_map this
            # carries the input's varying-manual-axes type so the scan
            # carry typechecks (outside shard_map it folds to plain 0)
            zv = (jnp.sum(weights[:1, :1]) * 0.0).astype(dt)
            init = (zv, zv, jnp.zeros((nao, nao), dt) + zv)
            (n, e, v), _ = jax.lax.scan(block, init,
                                        (aod_blocks, weights))
            return n, e, v + v.T

        self._cache[key] = run
        return run

    def _get_rks_fn(self, mol, xc_code):
        key = (id(mol), xc_code, 'r-jit')
        if key in self._cache:
            return self._cache[key]
        fn = jax.jit(self._get_rks_core(mol, xc_code))
        self._cache[key] = fn
        return fn

    def _get_rks_core(self, mol, xc_code):
        """Unjitted traceable (coords, weights, dm) -> (n, exc, vmat); for
        fusion into larger programs (the fused SCF step).  Evaluates AOs
        per block then defers to the aod core (single source of the
        LDA/GGA/mGGA quadrature math)."""
        key = (id(mol), xc_code, 'r')
        if key in self._cache:
            return self._cache[key]
        xc = xc_mod.parse_xc(xc_code)
        deriv = 1 if (xc.is_gga or xc.is_mgga) else 0
        core = self._get_rks_core_aod(mol, xc_code)

        def run(coords, weights, dm):
            def block(carry, c):
                return carry, eval_ao(mol, c, deriv=deriv)
            _, aod = jax.lax.scan(block, 0, coords)
            return core(aod, weights, dm)

        self._cache[key] = run
        return run

    def _get_uks_core_aod(self, mol, xc_code):
        """Traceable (aod, weights, dm(2,n,n)) -> (n(2,), exc, vmat(2,n,n))
        over precomputed AO blocks."""
        key = (id(mol), xc_code, 'u-aod')
        if key in self._cache:
            return self._cache[key]
        xc = xc_mod.parse_xc(xc_code)
        mgga = xc.is_mgga
        deriv = 1 if (xc.is_gga or mgga) else 0

        def edens(ra, rb, saa, sab, sbb, ta, tb):
            if mgga:
                return xc.exc_density(ra, rb, saa, sab, sbb, ta, tb)
            return xc.exc_density(ra, rb, saa, sab, sbb)

        exc_grad = jax.grad(
            lambda *a: jnp.sum(edens(*a)), argnums=(0, 1, 2, 3, 4, 5, 6))

        def run(aod_blocks, weights, dm):
            def block(carry, xw):
                n_acc, e_acc, v_acc = carry
                aod, w = xw
                ao = aod if deriv == 0 else aod[0]
                rhos, grhos, taus = [], [], []
                for s in range(2):
                    dmao = ao @ dm[s]
                    r = jnp.maximum(jnp.einsum('bi,bi->b', dmao, ao), 0.0)
                    g = (2.0 * jnp.einsum('bi,dbi->db', dmao, aod[1:])
                         if deriv else jnp.zeros((3,) + r.shape))
                    if mgga:
                        dmaod = jnp.einsum('dbi,ij->dbj', aod[1:], dm[s])
                        t = 0.5 * jnp.einsum('dbi,dbi->b', dmaod, aod[1:])
                    else:
                        t = jnp.zeros_like(r)
                    rhos.append(r)
                    grhos.append(g)
                    taus.append(t)
                ra, rb = rhos
                saa = jnp.einsum('db,db->b', grhos[0], grhos[0])
                sab = jnp.einsum('db,db->b', grhos[0], grhos[1])
                sbb = jnp.einsum('db,db->b', grhos[1], grhos[1])
                rho_thr, sig_floor = _floors(ra.dtype)
                tau_floor = 1e-12 if ra.dtype == jnp.float32 else 1e-20
                mask = (ra + rb) > rho_thr
                sf = lambda x, lo: jnp.where(mask, jnp.maximum(x, lo), 1.0)
                ras, rbs = sf(ra, 0.5 * rho_thr), sf(rb, 0.5 * rho_thr)
                saas = sf(saa, sig_floor)
                sabs = sf(sab, -jnp.inf)
                sbbs = sf(sbb, sig_floor)
                tas = sf(taus[0], tau_floor)
                tbs = sf(taus[1], tau_floor)
                e_blk = jnp.sum(jnp.where(
                    mask, w * edens(ras, rbs, saas, sabs, sbbs, tas, tbs),
                    0.0))
                vra, vrb, vsaa, vsab, vsbb, vta, vtb = exc_grad(
                    ras, rbs, saas, sabs, sbbs, tas, tbs)
                vs = []
                for vr, vss, vsx, vt, go, gx in (
                        (vra, vsaa, vsab, vta, grhos[0], grhos[1]),
                        (vrb, vsbb, vsab, vtb, grhos[1], grhos[0])):
                    wv = jnp.where(mask, w * vr, 0.0)
                    vtmp = 0.5 * wv[:, None] * ao
                    vb = None
                    if deriv:
                        wvss = jnp.where(mask, w * vss, 0.0)
                        wvsx = jnp.where(mask, w * vsx, 0.0)
                        vtmp = vtmp \
                            + 2.0 * jnp.einsum('b,db,dbi->bi', wvss, go,
                                               aod[1:]) \
                            + jnp.einsum('b,db,dbi->bi', wvsx, gx, aod[1:])
                    vb = ao.T @ vtmp
                    if mgga:
                        wvt = jnp.where(mask, w * vt, 0.0)
                        vb = vb + 0.25 * jnp.einsum(
                            'dbi,b,dbj->ij', aod[1:], wvt, aod[1:])
                    vs.append(vb)
                v_blk = jnp.stack(vs)
                n_blk = jnp.stack([jnp.sum(w * ra), jnp.sum(w * rb)])
                return (n_acc + n_blk, e_acc + e_blk, v_acc + v_blk), None

            nao = dm.shape[-1]
            dt = dm.dtype
            zv = (jnp.sum(weights[:1, :1]) * 0.0).astype(dt)
            init = (jnp.zeros(2, dt) + zv, zv,
                    jnp.zeros((2, nao, nao), dt) + zv)
            (n, e, v), _ = jax.lax.scan(block, init, (aod_blocks, weights))
            return n, e, v + v.transpose(0, 2, 1)

        self._cache[key] = run
        return run

    # -------------------------------------------------------------
    def _get_uks_fn(self, mol, xc_code):
        key = (id(mol), xc_code, 'u-jit')
        if key in self._cache:
            return self._cache[key]
        fn = jax.jit(self._get_uks_core(mol, xc_code))
        self._cache[key] = fn
        return fn

    def _get_uks_core(self, mol, xc_code):
        """Unjitted traceable (coords, weights, dm) -> (n, exc, vmat)."""
        key = (id(mol), xc_code, 'u')
        if key in self._cache:
            return self._cache[key]
        xc = xc_mod.parse_xc(xc_code)

        def esum(ra, rb, saa, sab, sbb):
            return jnp.sum(xc.exc_density(ra, rb, saa, sab, sbb))

        exc_grad = jax.grad(esum, argnums=(0, 1, 2, 3, 4))

        def run(coords, weights, dm):
            def block(carry, cw):
                n_acc, e_acc, v_acc = carry
                c, w = cw
                aod = eval_ao(mol, c, deriv=1)
                ao = aod[0]
                rhos, grhos = [], []
                for s in range(2):
                    dmao = ao @ dm[s]
                    r = jnp.maximum(jnp.einsum('bi,bi->b', dmao, ao), 0.0)
                    g = 2.0 * jnp.einsum('bi,dbi->db', dmao, aod[1:])
                    rhos.append(r)
                    grhos.append(g)
                ra, rb = rhos
                saa = jnp.einsum('db,db->b', grhos[0], grhos[0])
                sab = jnp.einsum('db,db->b', grhos[0], grhos[1])
                sbb = jnp.einsum('db,db->b', grhos[1], grhos[1])
                mask = (ra + rb) > RHO_THR
                sf = lambda x, lo: jnp.where(mask, jnp.maximum(x, lo), 1.0)
                ras, rbs = sf(ra, 0.5 * RHO_THR), sf(rb, 0.5 * RHO_THR)
                saas = sf(saa, SIGMA_FLOOR)
                sabs = sf(sab, -jnp.inf)
                sbbs = sf(sbb, SIGMA_FLOOR)
                e_blk = jnp.sum(jnp.where(
                    mask, w * xc.exc_density(ras, rbs, saas, sabs, sbbs), 0.0))
                vra, vrb, vsaa, vsab, vsbb = exc_grad(ras, rbs, saas, sabs,
                                                      sbbs)
                vs = []
                for vr, vss, vsx, go, gx in (
                        (vra, vsaa, vsab, grhos[0], grhos[1]),
                        (vrb, vsbb, vsab, grhos[1], grhos[0])):
                    wv = jnp.where(mask, w * vr, 0.0)
                    wvss = jnp.where(mask, w * vss, 0.0)
                    wvsx = jnp.where(mask, w * vsx, 0.0)
                    vtmp = 0.5 * wv[:, None] * ao \
                        + 2.0 * jnp.einsum('b,db,dbi->bi', wvss, go, aod[1:]) \
                        + jnp.einsum('b,db,dbi->bi', wvsx, gx, aod[1:])
                    vs.append(ao.T @ vtmp)
                v_blk = jnp.stack(vs)
                n_blk = jnp.stack([jnp.sum(w * ra), jnp.sum(w * rb)])
                return (n_acc + n_blk, e_acc + e_blk, v_acc + v_blk), None

            nao = mol.nao
            init = (jnp.zeros(2), 0.0, jnp.zeros((2, nao, nao)))
            (n, e, v), _ = jax.lax.scan(block, init, (coords, weights))
            v = v + v.transpose(0, 2, 1)
            return n, e, v

        self._cache[key] = run
        return run

    # helpers used by other modules
    def eval_ao(self, mol, coords, deriv=0):
        return eval_ao(mol, coords, deriv)

    def hybrid_coeff(self, xc_code, spin=0):
        return xc_mod.hybrid_coeff(xc_code)

    def rsh_coeff(self, xc_code):
        """(omega, alpha_LR, hyb_SR); reference dft/libxc.py:436."""
        return xc_mod.rsh_coeff(xc_code)

    def rsh_and_hybrid_coeff(self, xc_code, spin=0):
        omega, alpha, hyb = xc_mod.rsh_coeff(xc_code)
        if omega == 0:
            hyb = xc_mod.hybrid_coeff(xc_code)
        return omega, alpha, hyb

    def _xc_type(self, xc_code):
        xc = xc_mod.parse_xc(xc_code)
        return 'GGA' if xc.is_gga else 'LDA'
