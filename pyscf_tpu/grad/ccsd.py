"""Analytic CCSD nuclear gradients via the CC Lagrangian + generic
orbital response.

Reference analog: pyscf/grad/ccsd.py (hand-derived 2-PDM contractions
over int2e_ip1 via grad/lagrange.py).  Here the CCSD Lagrangian

    L(X) = E(t; f(X), v(X)) + sum l1*r1(t; f(X), v(X)) + sum l2*r2(...)

is stationary in (t, lambda) by construction (cc/gccsd_lambda.py solves
0 = dL/dt), so grad/response.py's z-vector machinery needs only its
(X, Co, Cv) dependence: the spin-orbital f and <pq||rs> are rebuilt
traceably from the DF factorization at every X and reverse-mode AD does
the rest.  No hand-derived 2-PDM or Lagrangian algebra.

Consistency: the amplitudes are converged on the SAME DF-assembled
integrals the Lagrangian traces (mf._eri is set to the DF AO ERI), so
stationarity holds exactly, not just to the DF fitting error.
"""
import numpy as np
import jax.numpy as jnp

from ..ops.device import integral_compute
from .response import response_gradient, make_df_mo_eri_fn
from .autodiff import grad_scf


def _so_maps(mf):
    """Spin-orbital ordering of cc/gccsd._spin_orbital_eris for an RHF
    reference: occupied first, each doubly (alpha then beta by stable
    sort), then virtuals."""
    mo_e = np.asarray(mf.mo_energy)
    mo_o = np.asarray(mf.mo_occ)
    entries = []
    for s in range(2):
        for p in range(mo_e.shape[0]):
            entries.append((mo_e[p], s, p, mo_o[p] > 0))
    entries.sort(key=lambda t: (not t[3], t[0]))
    spins = np.array([e[1] for e in entries])
    orbs = np.array([e[2] for e in entries])
    nocc = int(sum(1 for e in entries if e[3]))
    return spins, orbs, nocc


def make_ccsd_lagrangian_fn(mf, t1, t2, l1, l2, spins, orbs):
    """Traceable L_corr(X, Co, Cv, eo, ev) for converged (t, lambda)."""
    from ..cc.gccsd_lambda import _resid, _energy
    from ..grad.autodiff import _j2c, _build_host_data_cached
    from ..hessian.rhf import _s_h_builders, _j3c_builder
    import jax

    mol = mf.mol
    auxmol = mf.with_df.auxmol
    naux = auxmol.nao
    pairs, auxes = _build_host_data_cached(mol, auxmol)
    _, h_fun = _s_h_builders(mol, pairs)
    j3c_fun = _j3c_builder(mol, auxmol, pairs, auxes)
    nao = mol.nao
    so_sel = (spins[:, None] == spins[None, :])
    oP = jnp.asarray(orbs)
    sel = jnp.asarray(so_sel)

    def f(X, Co, Cv, eo, ev):
        C = jnp.concatenate([Co, Cv], axis=1)
        nmo = C.shape[1]
        j3 = j3c_fun(X)
        j2 = _j2c(auxes, naux, X)
        L = jnp.linalg.cholesky(j2)
        B = jax.scipy.linalg.solve_triangular(
            L, j3.reshape(nao * nao, naux).T, lower=True).reshape(
                naux, nao, nao)
        Bmo = jnp.einsum('pmn,mi,nj->pij', B, C, C)
        eri_mo = jnp.einsum('pij,pkl->ijkl', Bmo, Bmo)   # chemist (ij|kl)
        # AO fock at frozen converged density
        D0 = 2.0 * Co @ Co.T
        gam = jnp.einsum('pij,ji->p', B, D0)
        vj = jnp.einsum('p,pij->ij', gam, B)
        BD = jnp.einsum('pik,kl->pil', B, D0)
        vk = jnp.einsum('pil,plj->ij', BD, B)
        f_ao = h_fun(X) + vj - 0.5 * vk
        f_mo = C.T @ f_ao @ C
        # spin-orbital expansion (RHF: same spatial block for both spins)
        f_so = f_mo[oP[:, None], oP[None, :]] * sel
        eri_so = (eri_mo[oP[:, None, None, None], oP[None, :, None, None],
                         oP[None, None, :, None], oP[None, None, None, :]]
                  * (sel[:, :, None, None] & sel[None, None, :, :]))
        phys = eri_so.transpose(0, 2, 1, 3)
        asym = phys - phys.transpose(0, 1, 3, 2)
        e = _energy(t1, t2, f_so, asym)
        r1, r2 = _resid(t1, t2, f_so, asym)
        return e + jnp.sum(l1 * r1) + jnp.sum(l2 * r2)

    return f


class Gradients:
    """g = cc.CCSD(mf).Gradients().kernel() for a DF-RHF reference.

    Converges spin-orbital amplitudes and Lambda on the DF-assembled
    integrals, then closes orbital relaxation with one z-vector solve."""

    def __init__(self, mycc):
        self.mycc = mycc
        self.mf = mycc._scf
        self.mol = mycc.mol
        self.de = None

    def kernel(self):
        mf = self.mf
        if getattr(mf, 'with_df', None) is None:
            raise NotImplementedError('CCSD gradients need density '
                                      'fitting; use mf.density_fit()')
        if getattr(self.mycc, 'frozen', 0):
            raise NotImplementedError('frozen-core CCSD gradients')
        with integral_compute():
            e_scf, g_scf = grad_scf(mf)

            # DF-consistent AO ERI for the amplitude/lambda solves
            B = np.asarray(mf.with_df.cderi)
            eri_df = np.einsum('pij,pkl->ijkl', B, B)
            from ..cc.gccsd import GCCSD, _spin_orbital_eris
            from ..cc.gccsd_lambda import solve_lambda
            mf_df = mf
            eri_save = getattr(mf_df, '_eri', None)
            mf_df._eri = eri_df
            try:
                mycc = GCCSD(mf_df)
                mycc.verbose = 0
                mycc.kernel()
                assert mycc.converged
                eris, mo_e, nocc, spins, orbs = _spin_orbital_eris(mf_df)
                f_diag = jnp.diag(mo_e)
                l1, l2, conv = solve_lambda(mycc.t1, mycc.t2, f_diag,
                                            eris, mo_e)
                assert conv
            finally:
                mf_df._eri = eri_save

            fL = make_ccsd_lagrangian_fn(mf, mycc.t1, mycc.t2, l1, l2,
                                         spins, orbs)
            e_corr, g_corr = response_gradient(mf, fL)
        self.e_corr = float(e_corr)
        self.de = np.asarray(g_scf) + np.asarray(g_corr)
        return self.de
