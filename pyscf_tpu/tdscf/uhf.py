"""TDA for unrestricted references (UHF/UKS).

Reference analog: pyscf/tdscf/uhf.py / uks.py. The ph space is the
direct sum of the alpha and beta blocks:

  A[ia s, jb t] = d_st d_ij d_ab (ea - ei)_s + (ia_s|jb_t)
                  - d_st hyb (ij|ab)_s + fxc[st]

with the spin-resolved fxc from jax.hessian of the XC energy density
over (ra, rb, ga, gb) features (same machinery as tdscf/rhf._fxc_ov,
evaluated at the actual spin densities). Oracle: for a closed-shell
reference the spectrum equals the union of the RKS singlet and triplet
TDA spectra (tests/test_tdscf_extras.py).
"""
import numpy as np
import jax
import jax.numpy as jnp


def get_ab_uhf(mf):
    """Dense A matrix over the stacked (alpha ph, beta ph) space."""
    mol = mf.mol
    mo_c = [np.asarray(c) for c in mf.mo_coeff] \
        if np.asarray(mf.mo_coeff).ndim == 3 else [np.asarray(mf.mo_coeff)] * 2
    mo_e = np.asarray(mf.mo_energy)
    mo_o = np.asarray(mf.mo_occ)
    if mo_e.ndim == 1:
        mo_e = np.stack([mo_e, mo_e])
        mo_o = np.stack([(mo_o > 0) * 1.0, (mo_o == 2) * 1.0])
    cos, cvs, eos, evs = [], [], [], []
    for s in range(2):
        occ = mo_o[s] > 0
        cos.append(mo_c[s][:, occ])
        cvs.append(mo_c[s][:, ~occ])
        eos.append(mo_e[s][occ])
        evs.append(mo_e[s][~occ])
    dims = [cos[s].shape[1] * cvs[s].shape[1] for s in range(2)]
    ntot = dims[0] + dims[1]

    from .. import ao2mo
    eri_ao = getattr(mf, '_eri', None)
    if eri_ao is None:
        eri_ao = mol.intor('int2e')
        mf._eri = eri_ao
    is_ks = hasattr(mf, 'xc')
    hyb = 1.0
    if is_ks:
        from ..dft import xc as xc_mod
        hyb = float(xc_mod.hybrid_coeff(mf.xc))

    a = np.zeros((ntot, ntot))
    offs = [0, dims[0]]
    for s in range(2):
        no, nv = cos[s].shape[1], cvs[s].shape[1]
        diag = (evs[s][None, :] - eos[s][:, None]).reshape(-1)
        sl = slice(offs[s], offs[s] + dims[s])
        a[sl, sl] += np.diag(diag)
        oovv = np.asarray(ao2mo.general(
            eri_ao, (cos[s], cos[s], cvs[s], cvs[s])))
        a[sl, sl] -= hyb * oovv.transpose(0, 2, 1, 3).reshape(dims[s],
                                                             dims[s])
        for t in range(2):
            ovov = np.asarray(ao2mo.general(
                eri_ao, (cos[s], cvs[s], cos[t], cvs[t])))
            st = slice(offs[t], offs[t] + dims[t])
            a[sl, st] += ovov.reshape(dims[s], dims[t])
    if is_ks:
        a += _fxc_ov_uks(mf, cos, cvs, dims)
    return 0.5 * (a + a.T), dims


def _fxc_ov_uks(mf, cos, cvs, dims):
    """Spin-blocked fxc coupling over the stacked ph space."""
    from ..dft import xc as xc_mod
    from ..ops.eval_gto import eval_ao
    from ..dft.numint import RHO_THR, _pad_grid
    xc = xc_mod.parse_xc(mf.xc)
    if mf.grids.coords is None:
        mf.grids.build()
    coords, weights = _pad_grid(mf.grids.coords, mf.grids.weights)
    dm = np.asarray(mf.make_rdm1())
    if dm.ndim == 2:
        dm = np.stack([0.5 * dm, 0.5 * dm])

    def e_of_u8(u):
        ra, rb = u[0], u[1]
        ga, gb = u[2:5], u[5:8]
        return xc.exc_density(ra, rb, ga @ ga, ga @ gb, gb @ gb)

    hess_fn = jax.vmap(jax.hessian(e_of_u8))
    ntot = dims[0] + dims[1]
    out = jnp.zeros((ntot, ntot))
    idx_blk = [jnp.array([0, 2, 3, 4]), jnp.array([1, 5, 6, 7])]
    cos_j = [jnp.asarray(c) for c in cos]
    cvs_j = [jnp.asarray(c) for c in cvs]
    dm_j = jnp.asarray(dm)

    @jax.jit
    def block(c, w):
        aod = eval_ao(mf.mol, c, deriv=1)
        ao = aod[0]
        feats = []
        for s in range(2):
            dmao = ao @ dm_j[s]
            r = jnp.maximum(jnp.einsum('bi,bi->b', dmao, ao), 0.0)
            g = 2.0 * jnp.einsum('bi,dbi->db', dmao, aod[1:])
            feats.append((r, g))
        mask = (feats[0][0] + feats[1][0]) > RHO_THR
        u = jnp.stack(
            [jnp.where(mask, feats[0][0], 0.5),
             jnp.where(mask, feats[1][0], 0.5)]
            + [jnp.where(mask, feats[0][1][d], 0.0) for d in range(3)]
            + [jnp.where(mask, feats[1][1][d], 0.0) for d in range(3)],
            axis=1)
        H8 = hess_fn(u)
        H8 = jnp.where(mask[:, None, None], H8, 0.0)
        ps = []
        for s in range(2):
            aoo = ao @ cos_j[s]
            aov = ao @ cvs_j[s]
            doo = jnp.einsum('dbm,mi->dbi', aod[1:], cos_j[s])
            dov = jnp.einsum('dbm,ma->dba', aod[1:], cvs_j[s])
            P0 = jnp.einsum('bi,ba->bia', aoo, aov)
            Pd = (jnp.einsum('dbi,ba->dbia', doo, aov)
                  + jnp.einsum('bi,dba->dbia', aoo, dov))
            P = jnp.concatenate([P0[None], Pd], axis=0)
            ps.append(P.reshape(4, P.shape[1], -1))
        blk = jnp.zeros((ntot, ntot))
        offs = [0, dims[0]]
        for s in range(2):
            for t in range(2):
                Hst = H8[:, idx_blk[s]][:, :, idx_blk[t]]
                HP = jnp.einsum('buv,vby->uby', Hst, ps[t])
                m = jnp.einsum('ubx,b,uby->xy', ps[s], w, HP)
                blk = blk.at[offs[s]:offs[s] + dims[s],
                             offs[t]:offs[t] + dims[t]].add(m)
        return blk

    for i in range(coords.shape[0]):
        out = out + block(coords[i], weights[i])
    return np.asarray(out)


class TDAUHF:
    """Dense TDA for UHF/UKS references."""

    nstates = 3
    conv_tol = 1e-8

    def __init__(self, mf):
        self._scf = mf
        self.mol = mf.mol
        self.e = None
        self.xy = None

    def kernel(self, nstates=None):
        n = nstates or self.nstates
        a, dims = get_ab_uhf(self._scf)
        w, v = np.linalg.eigh(a)
        self.e = w[:n]
        self.xy = [(v[:dims[0], i], v[dims[0]:, i]) for i in range(n)]
        return self.e


TDAUKS = TDAUHF
