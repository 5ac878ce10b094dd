"""ddCOSMO: domain-decomposition COSMO implicit solvent.

Analog of reference pyscf/solvent/ddcosmo.py (Cances, Maday, Stamm,
JCP 139, 054111 (2013); Lipparini et al., JCTC 9, 3637 (2013); the
quantum-mechanical coupling follows JCP 141, 184108 (2014)).

Per-atom spheres carry a real-spherical-harmonic basis (lmax); the
COSMO integral equation becomes the sparse block system L X = phi with
closed-form geometric couplings, solved densely here (natm*(lmax+1)^2
unknowns is tiny).  The electronic surface potential and the adjoint
Fock coupling reuse the batched int3c2e engine with sharp point-charge
Gaussians; the psi multipoles integrate the density over per-atom Becke
radial shells.

E_solv = 1/2 f(eps) <psi, X>,  V_solv = 1/2 f(eps) dE/dD.
"""
import numpy as np
import jax.numpy as jnp

from ..data import elements
from ..dft import gen_grid
from ..dft.lebedev import lebedev_grid
from ..lib.parameters import BOHR
from ..ops.integrals.cart2sph import _real_sph_harm

# UFF van-der-Waals radii (Angstrom, x_i/2 of the UFF force field;
# public data, same table as reference pyscf/data/radii.py UFF)
UFF_RADII = {
    1: 1.4430, 2: 1.1810, 3: 1.2255, 4: 1.3725, 5: 2.0415, 6: 1.9255,
    7: 1.8300, 8: 1.7500, 9: 1.6820, 10: 1.6215, 11: 1.4915, 12: 1.5105,
    13: 2.2495, 14: 2.1475, 15: 2.0735, 16: 2.0175, 17: 1.9735,
    18: 1.9340, 19: 1.9060, 20: 1.6995, 21: 1.6475, 22: 1.5875,
    23: 1.5720, 24: 1.5115, 25: 1.4805, 26: 1.4560, 27: 1.4360,
    28: 1.4170, 29: 1.7475, 30: 1.3815, 31: 2.1915, 32: 2.1400,
    33: 2.1150, 34: 2.1025, 35: 2.0945, 36: 2.0705, 37: 2.0570,
    38: 1.8205, 39: 1.6725, 40: 1.5620, 41: 1.5825, 42: 1.5260,
    43: 1.4990, 44: 1.4815, 45: 1.4645, 46: 1.4495, 47: 1.5740,
    48: 1.4240, 49: 2.2315, 50: 2.1960, 51: 2.2100, 52: 2.2350,
    53: 2.2500, 54: 2.2020, 55: 2.2585, 56: 1.8515, 78: 1.3770,
    79: 1.6465, 80: 1.3525, 82: 2.1735, 83: 2.1850,
}


def regularize_xt(t, eta):
    """Smooth characteristic function of 'inside sphere' (JCTC 9, 3637)."""
    xt = np.zeros_like(t)
    xt[t <= 1 - eta] = 1.0
    sel = (1 - eta < t) & (t < 1)
    ti = t[sel]
    xt[sel] = (1.0 / eta ** 5 * (1 - ti) ** 3
               * (6 * ti ** 2 + (15 * eta - 12) * ti
                  + 10 * eta ** 2 - 15 * eta + 6))
    return xt


def _ylm_stack(unit_vecs, lmax):
    """(nlm, n) real orthonormal spherical harmonics, l-major."""
    return np.concatenate([_real_sph_harm(l, unit_vecs)
                           for l in range(lmax + 1)], axis=0)


def _multipoles(vecs, lmax):
    """[r^l Y_lm(v/r) per l] — list of (2l+1, n) solid harmonics."""
    r = np.linalg.norm(vecs, axis=1)
    r_safe = np.where(r < 1e-30, 1.0, r)
    u = vecs / r_safe[:, None]
    out = []
    for l in range(lmax + 1):
        out.append(_real_sph_harm(l, u) * r ** l)
    return out


def _point_charge_ints(mol, points, expnt=1e9):
    """V[k,i,j] = <i| 1/|r - x_k| |j> via int3c2e with sharp s-Gaussians
    (the reference's gto.fakemol_for_charges trick, mole.py:4181)."""
    from ..gto.mole import Mole
    from ..ops.integrals.int2e import int3c2e
    points = np.asarray(points, dtype=float).reshape(-1, 3)
    fake = Mole(atom=[('X', tuple(p)) for p in points],
                basis=[[0, [expnt, 1.0]]], unit='bohr', verbose=0)
    fake.build()
    v = np.asarray(int3c2e(mol, fake))          # (nao, nao, npts)
    # our basis is L2-normalized; rescale each aux function to unit
    # total charge: integral of the L2-normalized s-Gaussian
    n2 = (2.0 * expnt / np.pi) ** 0.75
    integral = n2 * (np.pi / expnt) ** 1.5
    return v.transpose(2, 0, 1) / integral


class DDCOSMO:
    """ddCOSMO solvent model (reference solvent/ddcosmo.py ddCOSMO)."""

    lmax = 6
    eta = 0.1
    eps = 78.3553
    n_ang = 110          # Lebedev points per sphere (reference order 17)
    radii_scale = 1.1    # UFF * 1.1, reference default

    def __init__(self, mol, eps=None, lmax=None):
        self.mol = mol
        if eps is not None:
            self.eps = eps
        if lmax is not None:
            self.lmax = lmax
        self._built = False

    # ------------------------------------------------------------------
    def build(self):
        mol = self.mol
        natm = mol.natm
        lmax = self.lmax
        nlm = (lmax + 1) ** 2
        self.r_vdw = np.array([
            UFF_RADII.get(int(elements.charge(s)), 1.8) * self.radii_scale
            / BOHR for s in mol.raw_symbols])
        pts, w = lebedev_grid(self.n_ang)
        self.coords_1sph = pts
        self.weights_1sph = 4.0 * np.pi * w
        self.ylm_1sph = _ylm_stack(pts, lmax)            # (nlm, ngrid)
        ngrid = pts.shape[0]
        coords = np.asarray(mol.coords)
        r_vdw = self.r_vdw

        # fi/ui: how deep each surface point sits inside other spheres
        fi = np.zeros((natm, ngrid))
        for ia in range(natm):
            for ja in range(natm):
                if ja == ia:
                    continue
                v = r_vdw[ia] * pts + coords[ia] - coords[ja]
                fi[ia] += regularize_xt(np.linalg.norm(v, axis=1)
                                        / r_vdw[ja], self.eta)
        self.fi = fi
        self.ui = np.clip(1.0 - fi, 0.0, 1.0)

        # L matrix (JCTC 9, 3637, Eq 18)
        l_of = np.concatenate([[l] * (2 * l + 1) for l in range(lmax + 1)])
        Ldiag = 4.0 * np.pi / (2 * l_of + 1)
        L = np.zeros((natm, nlm, natm, nlm))
        for ia in range(natm):
            L[ia, np.arange(nlm), ia, np.arange(nlm)] = Ldiag / r_vdw[ia]
        part_w = self.weights_1sph[None, :] / np.maximum(fi, 1.0)
        for ja in range(natm):
            for ka in range(natm):
                if ka == ja:
                    continue
                vjk = r_vdw[ja] * pts + coords[ja] - coords[ka]
                tjk = np.linalg.norm(vjk, axis=1) / r_vdw[ka]
                wjk = regularize_xt(tjk, self.eta) * part_w[ja]
                if not wjk.any():
                    continue
                pol = _multipoles(vjk, lmax)
                p1 = 0
                for l in range(lmax + 1):
                    p0, p1 = p1, p1 + 2 * l + 1
                    fac = 4.0 * np.pi / (2 * l + 1) / r_vdw[ka] ** (l + 1)
                    L[ja, :, ka, p0:p1] -= fac * np.einsum(
                        'xn,n,mn->xm', self.ylm_1sph, wjk, pol[l])
        self.Lmat = L.reshape(natm * nlm, natm * nlm)

        # per-atom radial grids + cached multipole factors
        # (JCP 141, 184108 Eq 31: x_<^l / x_>^{l+1} Y_lm). The molecular
        # density is Becke-partitioned so each point belongs to exactly
        # one atom's multipole expansion (reference make_psi_vmat:464
        # integrates over the becke-weighted molecular grid per atom).
        tab = gen_grid.gen_atomic_grids(mol)
        _, becke_w = gen_grid.get_partition(mol, tab)
        self._atom_grids = []
        p1 = 0
        for ia, symb in enumerate(mol.elements_):
            gc, _ = tab[symb]
            p0, p1 = p1, p1 + gc.shape[0]
            gw = becke_w[p0:p1]
            r = np.linalg.norm(gc, axis=1)
            pol = _multipoles(gc, lmax)
            fak = []
            outside = r > r_vdw[ia]
            for l in range(lmax + 1):
                xx = pol[l] / r_vdw[ia] ** (l + 1)
                xx[:, outside] *= (r_vdw[ia] / r[outside]) ** (2 * l + 1)
                fak.append(xx * (4.0 * np.pi / (2 * l + 1)))
            fak = np.concatenate(fak, axis=0)            # (nlm, ngrid_a)
            self._atom_grids.append(
                (gc + coords[ia], np.asarray(gw), fak))

        # surface potential integrals at exposed points
        self._extern = self.ui > 0
        cav = (coords[:, None, :]
               + r_vdw[:, None, None] * pts[None, :, :])
        self._cav_pts = cav[self._extern]
        self._vints = _point_charge_ints(mol, self._cav_pts)

        # AO values on the atomic integration grids
        from ..ops.eval_gto import eval_ao
        self._ao_at_grids = [np.asarray(eval_ao(mol, jnp.asarray(gc)))
                             for gc, _, _ in self._atom_grids]
        self._built = True
        return self

    # ------------------------------------------------------------------
    def _phi(self, dm):
        """RHS of LX = phi (JCTC 9, 3637 Eq 16)."""
        mol = self.mol
        natm = mol.natm
        ngrid = self.coords_1sph.shape[0]
        z = np.asarray(mol.charges, dtype=float)
        coords = np.asarray(mol.coords)
        v = np.zeros((natm, ngrid))
        cav = (coords[:, None, :]
               + self.r_vdw[:, None, None] * self.coords_1sph[None, :, :])
        for ia in range(natm):
            d = np.linalg.norm(coords[:, None, :] - cav[ia][None, :, :],
                               axis=2)
            v[ia] = (z[:, None] / d).sum(axis=0)
        v_e = np.einsum('kij,ji->k', self._vints, np.asarray(dm))
        v[self._extern] -= v_e
        phi = -np.einsum('n,xn,jn,jn->jx', self.weights_1sph,
                         self.ylm_1sph, self.ui, v)
        return phi

    def _psi_vmat(self, dm, Xvec):
        """psi multipoles and the density-response potential matrix."""
        mol = self.mol
        natm = mol.natm
        nlm = (self.lmax + 1) ** 2
        nao = mol.nao
        dm_np = np.asarray(dm)
        psi = np.zeros((natm, nlm))
        vmat = np.zeros((nao, nao))
        for ia in range(natm):
            _, gw, fak = self._atom_grids[ia]
            ao = self._ao_at_grids[ia]
            den = np.einsum('gi,ij,gj->g', ao, dm_np, ao) * gw
            psi[ia] = -den @ fak.T
            wr = (Xvec[ia] @ fak) * gw
            vmat -= np.einsum('gi,g,gj->ij', ao, wr, ao)
        z = np.asarray(mol.charges, dtype=float)
        psi[:, 0] += np.sqrt(4.0 * np.pi) / self.r_vdw * z

        # adjoint solution and its surface coupling (JCP 141 Eq 39)
        LS = np.linalg.solve(self.Lmat.T, psi.ravel()).reshape(natm, nlm)
        LS = self._adjoint_filter(LS)
        xi = np.einsum('n,jn,xn,jx->jn', self.weights_1sph, self.ui,
                       self.ylm_1sph, LS)
        vmat += np.einsum('k,kij->ij', xi[self._extern], self._vints)
        return psi, vmat

    def _adjoint_filter(self, LS):
        """Hook for models that filter phi before the COSMO solve
        (ddPCM applies M = A_diele^-1 A_inf, so the adjoint surface
        coupling uses M^T L^-T psi)."""
        return LS

    def _get_vind(self, dm):
        if not self._built:
            self.build()
        if np.asarray(dm).ndim == 3:
            dm = dm[0] + dm[1]
        phi = self._phi(dm)
        natm = self.mol.natm
        nlm = (self.lmax + 1) ** 2
        Xvec = np.linalg.solve(self.Lmat, phi.ravel()).reshape(natm, nlm)
        psi, vmat = self._psi_vmat(dm, Xvec)
        f_eps = (self.eps - 1.0) / self.eps if self.eps > 0 else 1.0
        epcm = 0.5 * f_eps * float(np.einsum('jx,jx->', psi, Xvec))
        vpcm = 0.5 * f_eps * vmat
        return epcm, jnp.asarray(vpcm)

    kernel = _get_vind


def ddcosmo_for_scf(mf, eps=78.3553, lmax=6):
    """Attach ddCOSMO to a mean-field object (reference
    solvent/ddcosmo.py:245 / _attach_solvent)."""
    pcm = DDCOSMO(mf.mol, eps=eps, lmax=lmax)
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
