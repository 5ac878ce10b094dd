"""G0W0 with analytic continuation (analog of reference pyscf/gw/gw_ac.py).

Self-energy on the imaginary frequency axis from DF integrals (dense MXU
einsums over the auxiliary index), Pade (Thiele continued fraction)
continuation to real frequencies, quasiparticle equation solved by
fixed-point iteration.

  Π_PQ(iω)  = −4 Σ_ia L^P_ia L^Q_ia e_ia/(e_ia² + ω²)   (= χ0 < 0)
  Wc(iω)    = (1 − Π)⁻¹ − 1            (aux basis)
  Σ_c(p,iω') = −(1/π) ∫_0^∞ dω Σ_m |L_pm·|²_Wc(iω) (iω'−e_m)/((iω'−e_m)²+ω²)
  ε_p^QP    = ε_p^KS + Re Σ_c(ε^QP) + Σ_x,p − v_xc,p
"""
import numpy as np
import jax
import jax.numpy as jnp


def _scaled_legendre(nw, x0=0.5):
    """Gauss-Legendre on (0, ∞) via ω = x0(1+t)/(1−t) (reference
    gw/gw_ac.py _get_scaled_legendre_roots)."""
    t, w = np.polynomial.legendre.leggauss(nw)
    freqs = x0 * (1.0 + t) / (1.0 - t)
    wts = 2.0 * x0 * w / (1.0 - t) ** 2
    return freqs, wts


def _thiele_pade(zs, fs):
    """Thiele continued-fraction coefficients for Pade continuation."""
    n = len(zs)
    g = np.zeros((n, n), dtype=complex)
    g[0] = fs
    for i in range(1, n):
        g[i, i:] = (g[i - 1, i - 1] - g[i - 1, i:]) / (
            (zs[i:] - zs[i - 1]) * g[i - 1, i:])
    a = np.diagonal(g)

    def evaluate(z):
        z = np.asarray(z, dtype=complex)
        acf = np.zeros_like(z)
        for i in range(n - 1, 0, -1):
            acf = a[i] * (z - zs[i - 1]) / (1.0 + acf)
        return a[0] / (1.0 + acf)

    return evaluate


class GWAC:
    """G0W0@KS with analytic continuation; reference gw/gw_ac.py GWAC."""

    nw = 100           # quadrature points on the imaginary axis
    nw_sigma = 16      # Pade interpolation points
    max_cycle = 50
    conv_tol = 1e-8
    linearized = False

    def __init__(self, mf, frozen=0, auxbasis=None):
        self._scf = mf
        self.mol = mf.mol
        self.frozen = frozen or 0
        self.auxbasis = auxbasis
        self.mo_energy = None
        self.qp_converged = None

    def kernel(self, orbs=None, mo_energy=None):
        """mo_energy overrides the orbital energies entering G and W
        (the evGW outer loop); the QP equation stays anchored at the SCF
        eigenvalues."""
        mf = self._scf
        mol = self.mol
        mo_e_scf = np.asarray(mf.mo_energy)
        mo_e = np.asarray(mo_energy if mo_energy is not None
                          else mf.mo_energy)
        mo_c = np.asarray(mf.mo_coeff)
        occ = np.asarray(mf.mo_occ)
        nocc_full = int((occ > 0).sum())
        nmo_full = mo_e.shape[0]
        frz = self.frozen
        act = slice(frz, nmo_full)
        e = mo_e[act]
        e_scf = mo_e_scf[act]
        c = mo_c[:, act]
        nocc = nocc_full - frz
        nmo = e.shape[0]
        if orbs is None:
            orbs = range(nmo)
        orbs = [p - frz if p >= frz else p for p in orbs]

        # DF MO integrals L_pq (naux, nmo, nmo)
        from ..df.df import DF
        dfobj = getattr(mf, 'with_df', None)
        if dfobj is None:
            dfobj = DF(mol, self.auxbasis).build()
        L = jnp.einsum('Puv,up,vq->Ppq', dfobj.cderi, c, c)
        Lov = L[:, :nocc, nocc:]

        # exchange and vxc diagonals
        dm = mf.make_rdm1()
        vk_full = np.asarray(mf.get_jk(mol, dm, with_j=False)[1])
        sigma_x = -0.5 * np.einsum('up,uv,vp->p', c, vk_full, c)
        if hasattr(mf, 'xc'):
            n_, exc_, vxc_mat = mf._numint.nr_rks(mol, mf.grids, mf.xc, dm)
            hyb = float(mf._numint.hybrid_coeff(mf.xc))
            vxc_diag = np.einsum('up,uv,vp->p', c, np.asarray(vxc_mat), c)
            vxc_diag = vxc_diag - hyb * 0.5 * np.einsum(
                'up,uv,vp->p', c, vk_full, c)
        else:
            vxc_diag = sigma_x.copy()   # HF reference: Σx cancels vxc

        e_ia = e[nocc:][None, :] - e[:nocc][:, None]      # (no, nv) > 0
        freqs, wts = _scaled_legendre(self.nw)

        naux = L.shape[0]
        Lov_f = Lov.reshape(naux, -1)
        eia = jnp.asarray(e_ia.ravel())
        Lmo = jnp.asarray(L)
        # energies relative to the chemical potential: the imaginary-axis
        # contour requires occupied poles left / virtual poles right of mu
        ef = 0.5 * (e[nocc - 1] + e[nocc])
        emo = jnp.asarray(e - ef)

        @jax.jit
        def wc_diag(omega, wprime_grid, porb):
            """contribution of quadrature point omega to Σ_c(p, iω'_n)."""
            d = -4.0 * eia / (eia ** 2 + omega ** 2)
            Pi = (Lov_f * d[None, :]) @ Lov_f.T
            wc = jnp.linalg.inv(jnp.eye(naux) - Pi) - jnp.eye(naux)
            Lp = Lmo[:, porb, :]                         # (naux, nmo)
            wpm = jnp.einsum('Pm,PQ,Qm->m', Lp, wc, Lp)  # (nmo,)
            num = (1j * wprime_grid[:, None] - emo[None, :])
            kern = num / (num ** 2 + omega ** 2)
            return jnp.einsum('m,nm->n', wpm, kern)

        wp_grid = jnp.asarray(_scaled_legendre(self.nw_sigma, 0.5)[0])

        mo_energy = mo_e.copy()
        conv_all = True
        for p in orbs:
            sig = np.zeros(self.nw_sigma, dtype=complex)
            for omega, wt in zip(freqs, wts):
                sig += -wt / np.pi * np.asarray(
                    wc_diag(omega, wp_grid, p))
            pade = _thiele_pade(1j * np.asarray(wp_grid), sig)
            e0 = e_scf[p]
            ep = e0
            conv = False
            for it in range(self.max_cycle):
                # evaluate relative to mu, slightly off the real axis
                sc = pade(ep - ef + 1j * 1e-3).real
                ep_new = e0 + sc + float(sigma_x[p]) - float(vxc_diag[p])
                if abs(ep_new - ep) < self.conv_tol:
                    conv = True
                    ep = ep_new
                    break
                ep = 0.5 * (ep + ep_new)    # damped fixed point
            conv_all &= conv
            mo_energy[frz + p] = ep
        self.mo_energy = mo_energy
        self.qp_converged = conv_all
        self.Lpq = np.asarray(L)
        self.nocc = nocc_full
        self.mo_coeff = mo_c
        return mo_energy


GW = GWAC
