"""ddPCM: domain-decomposition polarizable continuum model.

Analog of reference pyscf/solvent/ddpcm.py (Stamm et al., JCP 144,
054101 (2016)).  ddPCM generalizes ddCOSMO from the conductor limit to
the true dielectric: the surface potential Phi is first filtered through
the integral-equation pair

    A_eps  = A + 2 pi (eps+1)/(eps-1) I
    A_inf  = A + 2 pi I
    Phi_eps = A_eps^{-1} A_inf Phi,

where A = -D is the domain-decomposition discretization of the
(negated) double-layer operator, derived from the exterior multipole
expansion with outward normals:

  [A_jj]_{lm,l'm'} = +2pi/(2l'+1) sum_n w_n U_j(s_n) Y_lm(s_n) Y_l'm'(s_n)
  [A_jk]_{lm,l'm'} = -4pi l'/(2l'+1) (r_k/|s_jn - x_k|)^(l'+1)
                     sum_n w_n U_j(s_n) Y_lm(s_n) Y_l'm'(v_jk_n)    (k != j)

then the COSMO system L X = Phi_eps and E = 1/2 <psi, X> (no f(eps)
prefactor: the eps dependence lives entirely in the A_eps filter).
Single-sphere oracle: the per-multipole response factor becomes
  M_l = (2pi + 2pi/(2l+1)) / (2pi (eps+1)/(eps-1) + 2pi/(2l+1))
      = (l+1)(eps-1) / ((l+1) eps + l),
the EXACT dielectric reaction-field factor — l=0 is the Born energy,
l=1 the Onsager dipole factor (tests/test_ddpcm.py checks this).  As
eps -> inf, A_eps -> A_inf and ddPCM == ddCOSMO (f_eps -> 1) exactly.
The reference implementation (flagged 'in testing') keeps COSMO's
f(eps) prefactor, uses an inconsistent diagonal sign for D, and
evaluates its off-diagonal radial weight at l = lmax for every l';
all three are corrected here.
"""
import numpy as np

from .ddcosmo import DDCOSMO, _multipoles, regularize_xt  # noqa: F401


class DDPCM(DDCOSMO):
    """ddPCM solvent model (reference solvent/ddpcm.py DDPCM)."""

    def build(self):
        super().build()
        mol = self.mol
        natm = mol.natm
        lmax = self.lmax
        nlm = (lmax + 1) ** 2
        pts = self.coords_1sph
        coords = np.asarray(mol.coords)
        r_vdw = self.r_vdw
        ylm = self.ylm_1sph                      # (nlm, ngrid)
        A = np.zeros((natm, nlm, natm, nlm))
        for ja in range(natm):
            w_u = self.weights_1sph * self.ui[ja]
            p1 = 0
            for l in range(lmax + 1):
                p0, p1 = p1, p1 + 2 * l + 1
                a = np.einsum('xn,n,mn->xm', ylm, w_u, ylm[p0:p1])
                A[ja, :, ja, p0:p1] += 2.0 * np.pi / (2 * l + 1) * a
            for ka in range(natm):
                if ka == ja:
                    continue
                vjk = r_vdw[ja] * pts + coords[ja] - coords[ka]
                rjk = np.linalg.norm(vjk, axis=1)
                # no distance cutoff: the double-layer coupling decays only
                # polynomially ((r_k/r_jk)^(l'+1), ~1e-2 relative at
                # r_j+r_k+6 bohr for l'=1) and the dense solve already
                # scales as (natm*nlm)^2 (advisor finding, round 4)
                pol = _multipoles(vjk, lmax)     # pol[l] = rjk^l Y(v^)
                p1 = 0
                for l in range(lmax + 1):
                    p0, p1 = p1, p1 + 2 * l + 1
                    if l == 0:
                        continue                 # factor l kills l'=0
                    fac = (4.0 * np.pi * l / (2 * l + 1)
                           * r_vdw[ka] ** (l + 1))
                    wl = w_u / rjk ** (2 * l + 1)
                    a = np.einsum('xn,n,mn->xm', ylm, wl, pol[l])
                    A[ja, :, ka, p0:p1] -= fac * a
        A = A.reshape(natm * nlm, natm * nlm)
        fac = 2.0 * np.pi * (self.eps + 1.0) / (self.eps - 1.0)
        self._A_diele = A + fac * np.eye(natm * nlm)
        self._A_inf = A + 2.0 * np.pi * np.eye(natm * nlm)
        return self

    def _adjoint_filter(self, LS):
        shape = LS.shape
        out = self._A_inf.T @ np.linalg.solve(self._A_diele.T, LS.ravel())
        return out.reshape(shape)

    def _get_vind(self, dm):
        import jax.numpy as jnp
        if not self._built:
            self.build()
        if np.asarray(dm).ndim == 3:
            dm = dm[0] + dm[1]
        phi = self._phi(dm)
        phi = np.linalg.solve(self._A_diele, self._A_inf @ phi.ravel())
        natm = self.mol.natm
        nlm = (self.lmax + 1) ** 2
        Xvec = np.linalg.solve(self.Lmat, phi).reshape(natm, nlm)
        psi, vmat = self._psi_vmat(dm, Xvec)
        epcm = 0.5 * float(np.einsum('jx,jx->', psi, Xvec))
        vpcm = 0.5 * vmat
        return epcm, jnp.asarray(vpcm)

    kernel = _get_vind


def ddpcm_for_scf(mf, eps=78.3553, lmax=6):
    """Attach ddPCM to a mean-field object (reference ddpcm_for_scf)."""
    pcm = DDPCM(mf.mol, eps=eps, lmax=lmax)
    mf.with_solvent = pcm
    veff_orig = mf.get_veff
    eelec_orig = mf.energy_elec

    def get_veff(mol=None, dm=None, *args, **kwargs):
        v = veff_orig(mol, dm, *args, **kwargs)
        e_solv, vfock = pcm._get_vind(dm)
        mf._e_solvent = e_solv
        return v + vfock

    def energy_elec(dm, h1e, vhf):
        e_solv, vfock = pcm._get_vind(dm)
        e = eelec_orig(dm, h1e, vhf - vfock)
        return e + e_solv

    mf.get_veff = get_veff
    mf.energy_elec = energy_elec
    return mf
