"""TDA / TDHF (RPA) excited states for closed-shell references.

Analog of reference pyscf/tdscf/rhf.py (TDA:920, TDHF:1156, get_ab:137).
Round-1 path builds the full A/B matrices densely (MXU) and diagonalizes;
the Davidson path (reference _lr_eig.py) comes with larger systems.
For KS references the fxc kernel is obtained from jax.hessian of the XC
energy density (replacing the reference's libxc 2nd-derivative tables).
"""
import numpy as np
import jax
import jax.numpy as jnp


def get_ab(mf, singlet=True):
    """Full A and B matrices in the MO ov space.

    singlet: A = e_diag + 2(ia|jb) - hyb (ij|ab) + fxc(aa+ab)
    triplet: A = e_diag            - hyb (ij|ab) + fxc(aa-ab)
    (reference tdscf/rhf.py get_ab:137 with its singlet/triplet kernels).
    """
    mol = mf.mol
    occ = np.asarray(mf.mo_occ) > 0
    co = mf.mo_coeff[:, occ]
    cv = mf.mo_coeff[:, ~occ]
    eo = np.asarray(mf.mo_energy)[occ]
    ev = np.asarray(mf.mo_energy)[~occ]
    nocc, nvir = co.shape[1], cv.shape[1]

    from .. import ao2mo
    eri_ao = getattr(mf, '_eri', None)
    if eri_ao is None and getattr(mf, 'with_df', None) is None:
        eri_ao = mol.intor('int2e')
        mf._eri = eri_ao
    if getattr(mf, 'with_df', None) is not None:
        from ..df.df_jk import _bmo
        B3 = mf.with_df.cderi
        Bov = _bmo(B3, co, cv)
        Boo = _bmo(B3, co, co)
        Bvv = _bmo(B3, cv, cv)
        ovov = jnp.einsum('xia,xjb->iajb', Bov, Bov)
        oovv = jnp.einsum('xij,xab->ijab', Boo, Bvv)
    else:
        ovov = ao2mo.general(eri_ao, (co, cv, co, cv))
        oovv = ao2mo.general(eri_ao, (co, co, cv, cv))

    hyb = 1.0
    is_ks = hasattr(mf, 'xc')
    if is_ks:
        from ..dft import xc as xc_mod
        hyb = xc_mod.hybrid_coeff(mf.xc)

    a = jnp.zeros((nocc, nvir, nocc, nvir))
    diag = (ev[None, :] - eo[:, None])
    idx_o = np.arange(nocc)
    idx_v = np.arange(nvir)
    a = a.at[idx_o[:, None], idx_v[None, :], idx_o[:, None],
             idx_v[None, :]].add(jnp.asarray(diag))
    a = a - hyb * oovv.transpose(0, 2, 1, 3)
    b = -hyb * ovov.transpose(0, 3, 2, 1)
    if singlet:
        a = a + 2.0 * ovov
        b = b + 2.0 * ovov

    if is_ks:
        a_xc, b_xc = _fxc_ov(mf, co, cv, singlet=singlet)
        a = a + a_xc
        b = b + b_xc
    return a, b


def _fxc_ov(mf, co, cv, singlet=True):
    """fxc coupling matrices from jax.hessian of the XC energy density.

    Spin-resolved features u = (ra, rb, ga, gb); the singlet coupling is
    the response to a symmetric spin perturbation (faa + fab blocks), the
    triplet to an antisymmetric one (faa - fab)."""
    from ..dft import xc as xc_mod
    from ..ops.eval_gto import eval_ao
    from ..dft.numint import _pad_grid, RHO_THR
    xc = xc_mod.parse_xc(mf.xc)
    if mf.grids.coords is None:
        mf.grids.build()
    coords, weights = _pad_grid(mf.grids.coords, mf.grids.weights)
    dm = mf.make_rdm1()
    gga = xc.is_gga

    def e_of_u8(u):
        # u = (ra, rb, gax, gay, gaz, gbx, gby, gbz) at one point
        ra, rb = u[0], u[1]
        ga, gb = u[2:5], u[5:8]
        saa = ga @ ga
        sab = ga @ gb
        sbb = gb @ gb
        return xc.exc_density(ra, rb, saa, sab, sbb)

    hess_fn = jax.vmap(jax.hessian(e_of_u8))
    sgn = 1.0 if singlet else -1.0

    nocc, nvir = co.shape[1], cv.shape[1]
    nov = nocc * nvir
    a_xc = jnp.zeros((nov, nov))

    @jax.jit
    def block(c, w, dm):
        aod = eval_ao(mf.mol, c, deriv=1)       # (4, B, nao)
        ao = aod[0]
        dmao = ao @ dm
        rho = jnp.maximum(jnp.einsum('bi,bi->b', dmao, ao), 0.0)
        grho = 2.0 * jnp.einsum('bi,dbi->db', dmao, aod[1:])
        mask = rho > RHO_THR
        half = jnp.where(mask, 0.5 * rho, 0.5)
        u = jnp.stack([half, half,
                       jnp.where(mask, 0.5 * grho[0], 0.0),
                       jnp.where(mask, 0.5 * grho[1], 0.0),
                       jnp.where(mask, 0.5 * grho[2], 0.0),
                       jnp.where(mask, 0.5 * grho[0], 0.0),
                       jnp.where(mask, 0.5 * grho[1], 0.0),
                       jnp.where(mask, 0.5 * grho[2], 0.0)],
                      axis=1)                                   # (B, 8)
        H8 = hess_fn(u)                                         # (B, 8, 8)
        H8 = jnp.where(mask[:, None, None], H8, 0.0)
        # spin-adapted kernel: same-spin block +/- cross-spin block,
        # with the aa/ab blocks in (ra, ga) x (rb, gb) ordering
        ia = jnp.array([0, 2, 3, 4])
        ib = jnp.array([1, 5, 6, 7])
        H = (H8[:, ia][:, :, ia] + sgn * H8[:, ia][:, :, ib])
        # pair features P_ia(r) = [phi_i phi_a, grad(phi_i phi_a)]
        aoo = jnp.einsum('bm,mi->bi', ao, co)
        aov = jnp.einsum('bm,ma->ba', ao, cv)
        doo = jnp.einsum('dbm,mi->dbi', aod[1:], co)
        dov = jnp.einsum('dbm,ma->dba', aod[1:], cv)
        P0 = jnp.einsum('bi,ba->bia', aoo, aov)                # (B, no, nv)
        Pd = (jnp.einsum('dbi,ba->dbia', doo, aov)
              + jnp.einsum('bi,dba->dbia', aoo, dov))
        P = jnp.concatenate([P0[None], Pd], axis=0)            # (4, B, no, nv)
        P = P.reshape(4, P.shape[1], nov)
        # A_xc = sum_g w P^T (faa +/- fab) P: each spin channel's
        # transition density is P, so the spin-adapted kernel is the
        # same-spin block plus/minus the cross-spin block
        HP = jnp.einsum('buv,vbx->ubx', H, P)
        blk = jnp.einsum('ubx,b,uby->xy', P, w, HP)
        return blk

    for i in range(coords.shape[0]):
        a_xc = a_xc + block(coords[i], weights[i], dm)
    a_xc = a_xc.reshape(nocc, nvir, nocc, nvir)
    return a_xc, a_xc


def gen_tda_operation(mf, singlet=True):
    """Matrix-free A·z product (reference tdscf/rhf.py:46
    gen_tda_operation): DF-MO Coulomb/exchange contractions on the MXU +
    the XC kernel applied as a jax.jvp of the Vxc map (no explicit fxc
    table — linearized response of the same autodiff XC used in the SCF).
    Returns (matvec, hdiag)."""
    mol = mf.mol
    occ = np.asarray(mf.mo_occ) > 0
    co = jnp.asarray(mf.mo_coeff[:, occ])
    cv = jnp.asarray(mf.mo_coeff[:, ~occ])
    eo = jnp.asarray(np.asarray(mf.mo_energy)[occ])
    ev = jnp.asarray(np.asarray(mf.mo_energy)[~occ])
    nocc, nvir = co.shape[1], cv.shape[1]
    is_ks = hasattr(mf, 'xc')
    hyb = 1.0
    if is_ks:
        from ..dft import xc as xc_mod
        hyb = float(xc_mod.hybrid_coeff(mf.xc))

    if getattr(mf, 'with_df', None) is not None:
        B3 = mf.with_df.cderi
        from ..df.df_jk import _bmo
        Bov = _bmo(B3, co, cv)          # (naux, no, nv)
        Boo = _bmo(B3, co, co)
        Bvv = _bmo(B3, cv, cv)

        def jk_part(z):
            az = jnp.zeros((nocc, nvir))
            if singlet:
                rho = jnp.einsum('xjb,jb->x', Bov, z)
                az = az + 2.0 * jnp.einsum('xia,x->ia', Bov, rho)
            if hyb != 0.0:
                az = az - hyb * jnp.einsum('xij,xab,jb->ia', Boo, Bvv, z)
            return az
    else:
        eri = mf._get_eri()

        def jk_part(z):
            dmz = co @ z @ cv.T
            az = jnp.zeros((nocc, nvir))
            if singlet:
                vj = jnp.einsum('uvls,sl->uv', eri, dmz + dmz.T)
                az = az + co.T @ vj @ cv          # 2 (ia|jb) z_jb
            if hyb != 0.0:
                # exchange response (ij|ab) z_jb: contract the ket AO of
                # each chemist pair with the occupied/virtual of dmz
                vk = jnp.einsum('unls,ns->ul', eri, dmz)
                az = az - hyb * co.T @ vk @ cv
            return az

    if is_ks:
        if mf.grids.coords is None:
            mf.grids.build()
        from ..dft.numint import _pad_grid
        deriv = 1 if mf.xc_obj.is_gga else 0
        aod, weights = mf._numint.grid_ao(mol, mf.grids, deriv)
        dm0 = jnp.asarray(mf.make_rdm1())
        if singlet:
            core = mf._numint._get_rks_core_aod(mol, mf.xc)

            def vxc_of(dm):
                return core(aod, weights, dm)[2]

            def fxc_part(z):
                # singlet coupling: the Vxc response to the symmetrized
                # transition density (both spin channels excited equally)
                ddm = co @ z @ cv.T
                ddm = ddm + ddm.T
                _, dv = jax.jvp(vxc_of, (dm0,), (ddm,))
                return co.T @ dv @ cv
        else:
            core_u = mf._numint._get_uks_core_aod(mol, mf.xc)
            dm_half = jnp.stack([0.5 * dm0, 0.5 * dm0])

            def vxca_of(dm2):
                return core_u(aod, weights, dm2)[2][0]

            def fxc_part(z):
                # triplet coupling: antisymmetric spin perturbation probes
                # faa - fab through the alpha Vxc response. The symmetrized
                # ddm carries 2*P z of density, so halve the tangent to
                # make each spin channel's perturbation P z (same
                # normalization the singlet path gets from its 1/2 in the
                # restricted kernel).
                ddm = co @ z @ cv.T
                ddm = 0.5 * (ddm + ddm.T)
                tang = jnp.stack([ddm, -ddm])
                _, dva = jax.jvp(vxca_of, (dm_half,), (tang,))
                return co.T @ dva @ cv
    else:
        def fxc_part(z):
            return jnp.zeros((nocc, nvir))

    ediag = (ev[None, :] - eo[:, None])

    @jax.jit
    def matvec(z):
        z = z.reshape(nocc, nvir)
        az = ediag * z + jk_part(z)
        if is_ks:
            az = az + fxc_part(z)
        return az.reshape(-1)

    hdiag = np.asarray(ediag).reshape(-1)
    return matvec, hdiag


class TDA:
    nstates = 3
    singlet = True
    conv_tol = 1e-8
    # use the iterative Davidson solver above this ov-space size
    dense_cutoff = 1500

    def __init__(self, mf):
        self._scf = mf
        self.mol = mf.mol
        self.e = None
        self.xy = None

    def kernel(self, nstates=None):
        n = nstates or self.nstates
        mf = self._scf
        occ = np.asarray(mf.mo_occ) > 0
        nocc = int(occ.sum())
        nvir = int((~occ).sum())
        nov = nocc * nvir
        if nov <= self.dense_cutoff:
            a, b = get_ab(mf, singlet=self.singlet)
            amat = np.asarray(a).reshape(nov, nov)
            w, v = np.linalg.eigh(amat)
            self.e = w[:n]
            self.xy = [(v[:, i].reshape(nocc, nvir) * np.sqrt(0.5), 0)
                       for i in range(n)]
            return self.e
        matvec, hdiag = gen_tda_operation(mf, singlet=self.singlet)
        from ..lib.linalg import davidson
        x0 = np.zeros((n, nov))
        order = np.argsort(hdiag)
        for i in range(n):
            x0[i, order[i]] = 1.0
        w, v, conv = davidson(matvec, x0, neig=n, tol=self.conv_tol,
                              hdiag=hdiag)
        self.e = np.asarray(w)[:n]
        self.xy = [(np.asarray(v[i]).reshape(nocc, nvir) * np.sqrt(0.5), 0)
                   for i in range(n)]
        return self.e

    run = kernel

    @property
    def e_tot(self):
        return np.asarray(self._scf.e_tot) + self.e

    def _r_ov(self):
        """MO ov blocks of the position operator <i|r|a>, (3, no, nv)."""
        from ..ops.integrals.int1e import int1e_r
        mf = self._scf
        occ = np.asarray(mf.mo_occ) > 0
        co = np.asarray(mf.mo_coeff)[:, occ]
        cv = np.asarray(mf.mo_coeff)[:, ~occ]
        r = np.asarray(int1e_r(self.mol))            # (3, nao, nao)
        return np.einsum('ui,xuv,va->xia', co, r, cv)

    def transition_dipole(self):
        """<0|r|n> per state, (nstates, 3). Spin-forbidden (triplet)
        transitions carry zero dipole by construction."""
        n = len(self.xy)
        if not self.singlet:
            return np.zeros((n, 3))
        r_ov = self._r_ov()
        out = np.zeros((n, 3))
        for i, (x, y) in enumerate(self.xy):
            xpy = np.asarray(x) + (np.asarray(y) if not np.isscalar(y) else 0)
            # |x+y| normalized with (x+y).(x-y) = 1/2 -> factor 2
            out[i] = 2.0 * np.einsum('xia,ia->x', r_ov, xpy)
        return out

    def oscillator_strength(self):
        dip = self.transition_dipole()
        return (2.0 / 3.0) * np.asarray(self.e) * np.sum(dip * dip, axis=1)

    def get_nto(self, state=0):
        """Natural transition orbitals of one excited state.

        Returns (weights, nto_coeff) with nto_coeff (nao, 2*k): hole
        orbitals first (descending weight), then particle orbitals.
        """
        mf = self._scf
        occ = np.asarray(mf.mo_occ) > 0
        co = np.asarray(mf.mo_coeff)[:, occ]
        cv = np.asarray(mf.mo_coeff)[:, ~occ]
        x = np.asarray(self.xy[state][0])
        u, s, vt = np.linalg.svd(x, full_matrices=False)
        w = s * s / np.sum(s * s)
        holes = co @ u
        parts = cv @ vt.T
        return w, np.hstack([holes, parts])


    def nuc_grad_method(self, state=1):
        """Analytic excited-state gradients (grad/tdrhf.py Gradients)."""
        from ..grad.tdrhf import Gradients
        return Gradients(self, state=state)

    Gradients = nuc_grad_method


class TDHF(TDA):
    def kernel(self, nstates=None):
        n = nstates or self.nstates
        a, b = get_ab(self._scf, singlet=self.singlet)
        nocc, nvir = a.shape[0], a.shape[1]
        nov = nocc * nvir
        amat = np.asarray(a).reshape(nov, nov)
        bmat = np.asarray(b).reshape(nov, nov)
        # Casida: (A-B)^(1/2) (A+B) (A-B)^(1/2) Z = w^2 Z (real orbitals)
        apb = amat + bmat
        amb = amat - bmat
        w2_amb, v_amb = np.linalg.eigh(amb)
        w2_amb = np.clip(w2_amb, 1e-14, None)
        sqrt_amb = (v_amb * np.sqrt(w2_amb)) @ v_amb.T
        isqrt_amb = (v_amb / np.sqrt(w2_amb)) @ v_amb.T
        m = sqrt_amb @ apb @ sqrt_amb
        w2, z = np.linalg.eigh(m)
        w = np.sqrt(np.clip(w2, 1e-14, None))
        self.e = w[:n]
        # recover (X, Y) normalized to (x+y).(x-y) = 1/2:
        # X+Y = (A-B)^{1/2} Z / sqrt(w), X-Y = (A-B)^{-1/2} Z sqrt(w),
        # so (X+Y).(X-Y) = |Z|^2 -> scale Z to norm 1/sqrt(2)
        self.xy = []
        for i in range(n):
            zi = z[:, i] / np.sqrt(2.0)
            xpy = sqrt_amb @ zi / np.sqrt(w[i])
            xmy = isqrt_amb @ zi * np.sqrt(w[i])
            x = 0.5 * (xpy + xmy).reshape(nocc, nvir)
            y = 0.5 * (xpy - xmy).reshape(nocc, nvir)
            self.xy.append((x, y))
        return self.e


TDDFT = TDHF
