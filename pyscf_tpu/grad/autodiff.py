"""Analytic nuclear gradients by automatic differentiation of a traceable
fixed-density energy.

For a converged SCF solution, dE/dX = ∂/∂X [ E_elec(X; D, C_occ) + E_nuc(X)
- tr(W S(X)) ] with the density matrix D and energy-weighted density
W = C_occ diag(occ·ε) C_occᵀ held fixed (Hellmann-Feynman + Pulay terms;
the implicit-function-theorem form of the reference's hand-derived
grad_elec, pyscf/grad/rhf.py:33 and grad/rks.py:33). Instead of coding
derivative integrals (reference int1e_ip*/int2e_ip1 C kernels + libxc vxc
gradient assembly), the energy is rebuilt as ONE traceable function of the
nuclear coordinates — McMurchie-Davidson pair tables, DF fit, XC
quadrature — and jax.grad emits the exact derivative program.

TPU discipline: no 3-center tensor is materialized. The DF two-electron
energy only needs
  γ_P    = Σ_ij D_ij (ij|P)              (naux,)
  O_P^ab = Σ_ij C_ia (ij|P) C_jb         (naux, nocc, nocc)
accumulated class-by-class on device; then E_J = ½ γᵀ j2c⁻¹ γ and
Σ(K·D) = Σ_vec(O)ᵀ j2c⁻¹ vec(O). Becke grid weights are held fixed (no
grid response), matching the reference default grid_response=False.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.device import integral_compute
from ..ops.integrals.int2e import (_eri_core, _paired_data_kernel,
                                   _aux_data_kernel, pair_screen_bound)
from ..ops.integrals.int1e import ovlp_chunk, kin_chunk, nuc_chunk, ATOM_PAD
from ..ops.integrals.cart2sph import cart2sph
from ..ops.integrals.hermite import cart_components, n_tuv
from ..ops.eval_gto import eval_ao

GRAD_SCREEN = 1e-14


class _GradPairs:
    """Host-side fixed data for one screened (la <= lb) shell-pair class."""

    def __init__(self, mol, la, lb, thresh=GRAD_SCREEN):
        ga, gb = mol.shell_groups[la], mol.shell_groups[lb]
        self.la, self.lb = la, lb
        self.ga, self.gb = ga, gb
        bound = pair_screen_bound(ga, gb)
        if la == lb:
            bound = np.triu(bound)
        sel = np.argwhere(bound > thresh)
        self.nsel = sel.shape[0]
        sa, sb = sel[:, 0], sel[:, 1]
        self.aid = jnp.asarray(ga.atom_ids[sa])   # bra atom of each pair
        self.bid = jnp.asarray(gb.atom_ids[sb])
        self.ea = jnp.asarray(ga.exps[sa])        # (nsel, Ka)
        self.ca = jnp.asarray(ga.coeffs[sa])
        self.eb = jnp.asarray(gb.exps[sb])
        self.cb = jnp.asarray(gb.coeffs[sb])
        # symmetry factor: pairs with distinct (shell, l) count twice
        if la == lb:
            self.fac = jnp.asarray(np.where(sa == sb, 1.0, 2.0))
        else:
            self.fac = jnp.asarray(np.full(self.nsel, 2.0))
        da, db = 2 * la + 1, 2 * lb + 1
        self.ia = ga.ao_off[sa][:, None] + np.arange(da)   # (nsel, da)
        self.jb = gb.ao_off[sb][:, None] + np.arange(db)
        self.Sa = jnp.asarray(cart2sph(la))
        self.Sb = jnp.asarray(cart2sph(lb))
        self.Ka = ga.nprim
        self.Kb = gb.nprim
        self.KK = self.Ka * self.Kb
        self.nca = len(cart_components(la))
        self.ncb = len(cart_components(lb))

    def mat_blocks(self, m):
        """Gather (nsel, da, db) blocks of an (nao, nao) matrix (host)."""
        m = np.asarray(m)
        return jnp.asarray(m[self.ia[:, :, None], self.jb[:, None, :]])

    def co_blocks(self, co):
        """Row blocks of occupied orbitals: (nsel, da, no), (nsel, db, no)."""
        co = np.asarray(co)
        return jnp.asarray(co[self.ia]), jnp.asarray(co[self.jb])

    def pair_data(self, X):
        ra = X[self.aid]
        rb = X[self.bid]
        return _paired_data_kernel(self.la, self.lb, self.ea, self.ca, ra,
                                   self.eb, self.cb, rb)

    def flat_prims(self, X):
        """(a, b, A, B, w) flattened over (pair, ka, kb) for the 1e kernels."""
        ra = X[self.aid]
        rb = X[self.bid]
        n, Ka, Kb = self.nsel, self.Ka, self.Kb
        m = n * Ka * Kb
        a = jnp.broadcast_to(self.ea[:, :, None], (n, Ka, Kb)).reshape(m)
        b = jnp.broadcast_to(self.eb[:, None, :], (n, Ka, Kb)).reshape(m)
        A = jnp.broadcast_to(ra[:, None, None, :],
                             (n, Ka, Kb, 3)).reshape(m, 3)
        B = jnp.broadcast_to(rb[:, None, None, :],
                             (n, Ka, Kb, 3)).reshape(m, 3)
        w = (self.ca[:, :, None] * self.cb[:, None, :]).reshape(m)
        return a, b, A, B, w

    def contract(self, blk_cart, mat_blk):
        """Σ_pairs fac * (cart block -> sph) · mat_blk  (a weighted trace)."""
        blk = blk_cart.reshape(self.nsel, self.KK, self.nca,
                               self.ncb).sum(axis=1)
        sph = jnp.einsum('mp,nq,spq->smn', self.Sa, self.Sb, blk)
        return jnp.sum(self.fac[:, None, None] * sph * mat_blk)


class _AuxData:
    """Host-side fixed data for the aux shells of one l (one full block)."""

    def __init__(self, auxmol, l):
        g = auxmol.shell_groups[l]
        self.l = l
        self.exps = jnp.asarray(g.exps)
        self.coeffs = jnp.asarray(g.coeffs)
        self.aid = jnp.asarray(g.atom_ids)
        self.K = g.nprim
        self.ns = g.nshl
        self.nc = len(cart_components(l))
        self.Sx = jnp.asarray(cart2sph(l))
        self.cols = jnp.asarray(
            (g.ao_off[:, None] + np.arange(2 * l + 1)).ravel())

    def data(self, X):
        return _aux_data_kernel(self.l, self.exps, self.coeffs, X[self.aid])


def _j2c(auxes, naux, X):
    j2c = jnp.zeros((naux, naux))
    cache = {ax.l: ax.data(X) for ax in auxes}
    for ax in auxes:
        px, Px, Ex = cache[ax.l]
        for ay in auxes:
            py, Py, Ey = cache[ay.l]
            blk = _eri_core(ax.l, ay.l, n_tuv(ax.l), n_tuv(ay.l),
                            px, Px, Ex, py, Py, Ey)
            blk = blk.reshape(ax.ns, ax.K, ax.nc, ay.ns, ay.K,
                              ay.nc).sum(axis=(1, 4))
            blk = jnp.einsum('mp,xpyq,nq->xmyn', ax.Sx, blk, ay.Sx)
            j2c = j2c.at[ax.cols[:, None], ay.cols[None, :]].set(
                blk.reshape(ax.cols.size, ay.cols.size))
    return j2c


def _df_intermediates(pairs, auxes, naux, X, dm_blocks, co_sets):
    """Accumulate γ_P (naux,) and one O_P (naux, no, no) per co-set.

    co_sets: list of K-exchange sets (one per spin channel); each is a
    list over pair classes of (ca (nsel,da,no), cb (nsel,db,no)). May be
    empty (J only)."""
    gam = jnp.zeros(naux)
    Os = [jnp.zeros((naux, cs[0][0].shape[-1], cs[0][0].shape[-1]))
          for cs in co_sets]
    aux_cache = {ax.l: ax.data(X) for ax in auxes}
    for ip, sp in enumerate(pairs):
        p1, P1, E1 = sp.pair_data(X)
        dmb = dm_blocks[ip]
        for ax in auxes:
            px, Px, Ex = aux_cache[ax.l]
            blk = _eri_core(sp.la + sp.lb, ax.l, E1.shape[2], n_tuv(ax.l),
                            p1, P1, E1, px, Px, Ex)
            blk = blk.reshape(sp.nsel, sp.KK, sp.nca, sp.ncb,
                              ax.ns, ax.K, ax.nc).sum(axis=(1, 5))
            blk = jnp.einsum('mp,nq,er,spqxr->smnxe', sp.Sa, sp.Sb, ax.Sx,
                             blk)                 # (nsel, da, db, ns, dx)
            g_cls = jnp.einsum('s,smn,smnxe->xe', sp.fac, dmb, blk)
            gam = gam.at[ax.cols].add(g_cls.reshape(-1))
            for k, cs in enumerate(co_sets):
                ca, cb = cs[ip]
                no = ca.shape[-1]
                # direct (μν|P) for every selected pair...
                t1 = jnp.einsum('smo,snp,smnxe->xeop', ca, cb, blk)
                # ...plus the mirrored (νμ|P) for pairs counted twice,
                # which is the direct term with (o,p) swapped
                t2 = jnp.einsum('s,smo,snp,smnxe->xeop', sp.fac - 1.0,
                                ca, cb, blk)
                o_cls = t1 + t2.transpose(0, 1, 3, 2)
                Os[k] = Os[k].at[ax.cols].add(
                    o_cls.reshape(ax.cols.size, no, no))
    return gam, Os


def _one_electron(pairs, X, dm_blocks, w_blocks, Xpad, Zpad):
    """tr(D (T+V)) - tr(W S), traceable in X (both AO centers and nuclei)."""
    e = 0.0
    for ip, sp in enumerate(pairs):
        a, b, A, B, w = sp.flat_prims(X)
        dmb, wb = dm_blocks[ip], w_blocks[ip]
        s_blk = ovlp_chunk(sp.la, sp.lb, a, b, A, B, w)
        t_blk = kin_chunk(sp.la, sp.lb, a, b, A, B, w)
        v_blk = nuc_chunk(sp.la, sp.lb, a, b, A, B, w, Xpad, Zpad)
        e = e + sp.contract(t_blk + v_blk, dmb) - sp.contract(s_blk, wb)
    return e


def _exc_quadrature(mol, xc, X, dm, coords, weights, restricted):
    """XC energy on fixed grid points/weights, AO centers from X."""
    from ..dft.numint import _masked, RHO_THR, SIGMA_FLOOR
    deriv = 1 if xc.is_gga else 0

    def block(e_acc, cw):
        c, w = cw
        if deriv == 0:
            ao = eval_ao(mol, c, deriv=0, atom_coords=X)
            aod = None
        else:
            aod = eval_ao(mol, c, deriv=1, atom_coords=X)
            ao = aod[0]

        def rho_sigma(d):
            dmao = ao @ d
            rho = jnp.maximum(jnp.einsum('bi,bi->b', dmao, ao), 0.0)
            if deriv == 0:
                return rho, jnp.zeros_like(rho)
            g = 2.0 * jnp.einsum('bi,dbi->db', dmao, aod[1:])
            return rho, jnp.einsum('db,db->b', g, g)

        if restricted:
            rho, sigma = rho_sigma(dm)
            mask, rho_s, sigma_s = _masked(rho, sigma)
            ra = 0.5 * rho_s
            s4 = 0.25 * sigma_s
            e_blk = jnp.sum(jnp.where(
                mask, w * xc.exc_density(ra, ra, s4, s4, s4), 0.0))
        else:
            ra_, saa = rho_sigma(dm[0])
            rb_, sbb = rho_sigma(dm[1])
            dmaoa = ao @ dm[0]
            dmaob = ao @ dm[1]
            if deriv:
                gaa = 2.0 * jnp.einsum('bi,dbi->db', dmaoa, aod[1:])
                gbb = 2.0 * jnp.einsum('bi,dbi->db', dmaob, aod[1:])
                sab = jnp.einsum('db,db->b', gaa, gbb)
            else:
                sab = jnp.zeros_like(ra_)
            mask = (ra_ + rb_) > RHO_THR
            sf = lambda x, lo: jnp.where(mask, jnp.maximum(x, lo), 1.0)
            e_blk = jnp.sum(jnp.where(
                mask, w * xc.exc_density(
                    sf(ra_, 0.5 * RHO_THR), sf(rb_, 0.5 * RHO_THR),
                    sf(saa, SIGMA_FLOOR), sf(sab, -jnp.inf),
                    sf(sbb, SIGMA_FLOOR)), 0.0))
        return e_acc + e_blk, None

    e, _ = jax.lax.scan(block, 0.0, (coords, weights))
    return e


def _enuc(X, Z):
    d = X[:, None, :] - X[None, :, :]
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + jnp.eye(X.shape[0]))
    off = 1.0 - jnp.eye(X.shape[0])
    return 0.5 * jnp.sum(off * Z[:, None] * Z[None, :] / r)


def build_grad_fn(mf):
    """Build (and cache on the Mole) the jitted dE/dX program for a
    converged DF mean-field object. Returns fn(X, dm, W, co) -> (E, dE/dX)
    with co the sqrt(occ)-scaled occupied orbitals (or a (2,...) pair)."""
    mol = mf.mol
    isks = hasattr(mf, 'xc')
    restricted = mf._fused_kind == 'restricted'
    auxmol = mf.with_df.auxmol if mf.with_df is not None else None
    if auxmol is None:
        raise NotImplementedError('autodiff gradients need density fitting; '
                                  'use mf.density_fit()')
    xc = None
    hyb = 1.0
    if isks:
        from ..dft import xc as xc_mod
        xc = xc_mod.parse_xc(mf.xc)
        hyb = float(mf._numint.hybrid_coeff(mf.xc))
        if mf.grids.coords is None:
            mf.grids.build()
        from ..dft.numint import _pad_grid
        coords, weights = _pad_grid(mf.grids.coords, mf.grids.weights)
    else:
        coords = weights = None

    pairs, auxes = _build_host_data_cached(mol, auxmol)
    naux = auxmol.nao
    natm = mol.natm
    natm_pad = -(-natm // ATOM_PAD) * ATOM_PAD
    Z = jnp.asarray(np.asarray(mol.charges, dtype=np.float64))

    with_k = (not isks) or hyb != 0.0
    kfac = 0.25 if restricted else 0.5   # E_K = -kfac·hyb·Σ_s Σ(K_s D_s)

    def energy(X, dm_blocks, w_blocks, co_sets, dm):
        Xpad = jnp.zeros((natm_pad, 3)).at[:natm].set(X)
        Zpad = jnp.zeros(natm_pad).at[:natm].set(Z)
        e = _enuc(X, Z)
        e = e + _one_electron(pairs, X, dm_blocks, w_blocks, Xpad, Zpad)
        gam, Os = _df_intermediates(pairs, auxes, naux, X, dm_blocks,
                                    co_sets if with_k else [])
        j2c = _j2c(auxes, naux, X)
        L = jnp.linalg.cholesky(j2c)
        u = jax.scipy.linalg.solve_triangular(L, gam, lower=True)
        e = e + 0.5 * jnp.dot(u, u)
        for O in Os:
            no = O.shape[-1]
            V = jax.scipy.linalg.solve_triangular(
                L, O.reshape(naux, no * no), lower=True)
            e = e - kfac * hyb * jnp.sum(V * V)
        if isks:
            e = e + _exc_quadrature(mol, xc, X, dm, coords, weights,
                                    restricted)
        return e

    grad_e = jax.jit(jax.value_and_grad(energy, argnums=0))

    def fn(X, dm, mo_coeff, mo_occ, mo_energy):
        dm_host = np.asarray(dm)
        occ = np.asarray(mo_occ)
        if restricted:
            sel = occ > 0
            co = np.asarray(mo_coeff)[:, sel] * np.sqrt(occ[sel])
            wdm = (np.asarray(mo_coeff)[:, sel]
                   * (occ[sel] * np.asarray(mo_energy)[sel])) \
                @ np.asarray(mo_coeff)[:, sel].T
            dm_blocks = [sp.mat_blocks(dm_host) for sp in pairs]
            co_sets = [[sp.co_blocks(co) for sp in pairs]]
        else:
            cos, wparts = [], []
            for s in range(2):
                sels = occ[s] > 0
                cos.append(np.asarray(mo_coeff[s])[:, sels]
                           * np.sqrt(occ[s][sels]))
                wparts.append((np.asarray(mo_coeff[s])[:, sels]
                               * (occ[s][sels]
                                  * np.asarray(mo_energy[s])[sels]))
                              @ np.asarray(mo_coeff[s])[:, sels].T)
            wdm = wparts[0] + wparts[1]
            dm_blocks = [sp.mat_blocks(dm_host[0] + dm_host[1])
                         for sp in pairs]
            co_sets = [[sp.co_blocks(c) for sp in pairs] for c in cos]
        w_blocks = [sp.mat_blocks(wdm) for sp in pairs]
        return grad_e(jnp.asarray(np.asarray(mol.coords)), dm_blocks,
                      w_blocks, co_sets, jnp.asarray(dm))

    return fn


def _build_host_data_cached(mol, auxmol):
    cache = getattr(mol, '_grad_prog_cache', None)
    if cache is None:
        cache = mol._grad_prog_cache = {}
    key = ('hostdata', id(auxmol))
    if key not in cache:
        ls = sorted(mol.shell_groups.keys())
        pairs = [_GradPairs(mol, la, lb)
                 for la in ls for lb in ls if la <= lb]
        pairs = [p for p in pairs if p.nsel > 0]
        auxes = [_AuxData(auxmol, lx)
                 for lx in sorted(auxmol.shell_groups.keys())]
        cache[key] = (pairs, auxes)
    return cache[key]


def grad_scf(mf):
    """dE/dX (natm, 3) for a converged DF-RHF/RKS/UHF/UKS object, plus the
    recomputed energy as a consistency check."""
    cache = getattr(mf.mol, '_grad_prog_cache', None)
    if cache is None:
        cache = mf.mol._grad_prog_cache = {}
    key = (type(mf).__name__, getattr(mf, 'xc', None),
           id(mf.with_df.auxmol) if mf.with_df else None)
    if key not in cache:
        cache[key] = build_grad_fn(mf)
    fn = cache[key]
    dm = mf.make_rdm1()
    with integral_compute():
        e, g = fn(jnp.asarray(np.asarray(mf.mol.coords)), dm,
                  mf.mo_coeff, mf.mo_occ, mf.mo_energy)
    # the traced objective is E - tr(W S) (the Pulay term shifts the value
    # but not the physics); add tr(W S) = Σ occ_i ε_i back for the check
    occ = np.asarray(mf.mo_occ)
    moe = np.asarray(mf.mo_energy)
    e_phys = float(e) + float((occ * moe).sum())
    g = np.asarray(g)
    if getattr(mf, 'with_solvent', None) is not None \
            and hasattr(mf.with_solvent, '_resp'):
        from .solvent import pcm_grad
        g = g + pcm_grad(mf)
    return e_phys, g
