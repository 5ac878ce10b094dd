"""C-PCM / COSMO implicit solvation (analog of reference pyscf/solvent/pcm.py:
PCM:260, gen_surface:131 and ddcosmo.py).

Cavity surface: van-der-Waals spheres discretized by Lebedev grids (the
same generator as the DFT code); exposed points kept by a hard switching
function. Conductor response q = -f(eps) K^-1 v; the electronic surface
potential and the solvent Fock contribution both reuse the batched
point-charge (nuclear-attraction) kernel.
"""
import numpy as np
import jax.numpy as jnp

from ..data import elements
from ..dft.lebedev import lebedev_grid
from ..lib.parameters import BOHR

# Bondi van der Waals radii (Angstrom), standard public table
VDW_RADII = {
    1: 1.20, 2: 1.40, 3: 1.82, 6: 1.70, 7: 1.55, 8: 1.52, 9: 1.47,
    10: 1.54, 11: 2.27, 12: 1.73, 14: 2.10, 15: 1.80, 16: 1.80,
    17: 1.75, 18: 1.88, 35: 1.85, 53: 1.98,
}


def gen_surface(mol, n_ang=110, scale=1.2, with_norm=False):
    """Exposed cavity points: (coords (n,3), areas (n,), atom ids
    [, outward normals])."""
    pts_all, area_all, atom_all, norm_all = [], [], [], []
    radii = np.array([VDW_RADII.get(int(z), 1.5) / BOHR * scale
                      for z in mol.charges])
    leb_pts, leb_w = lebedev_grid(n_ang)
    for ia in range(mol.natm):
        R = radii[ia]
        c = mol.coords[ia]
        pts = c + R * leb_pts
        area = leb_w * 4.0 * np.pi * R * R
        # keep points outside all other spheres
        keep = np.ones(len(pts), dtype=bool)
        for ja in range(mol.natm):
            if ja == ia:
                continue
            d = np.linalg.norm(pts - mol.coords[ja], axis=1)
            keep &= d > radii[ja]
        pts_all.append(pts[keep])
        area_all.append(area[keep])
        atom_all.append(np.full(keep.sum(), ia))
        norm_all.append(leb_pts[keep])
    out = (np.concatenate(pts_all), np.concatenate(area_all),
           np.concatenate(atom_all))
    if with_norm:
        return out + (np.concatenate(norm_all),)
    return out


class PCM:
    """Polarizable continuum model: C-PCM (conductor; eps -> inf recovers
    COSMO) or IEF-PCM (integral-equation formalism; reference
    solvent/pcm.py:260 supports the same pair)."""

    def __init__(self, mol, eps=78.3553, n_ang=110, scale=1.2,
                 method='C-PCM'):
        self.mol = mol
        self.eps = eps
        self.method = method.upper().replace('PCM', 'PCM')
        surf = gen_surface(mol, n_ang, scale, with_norm=True)
        self.surface = surf[:3]
        normals = surf[3]
        pts, area, _ = self.surface
        n = len(area)
        # single-layer S: diag 1.0694*sqrt(4 pi / a_k), offdiag 1/r
        dvec = pts[:, None, :] - pts[None, :, :]
        d = np.linalg.norm(dvec, axis=2)
        np.fill_diagonal(d, 1.0)
        S = 1.0 / d
        np.fill_diagonal(S, 1.0694 * np.sqrt(4.0 * np.pi / area))
        if self.method in ('C-PCM', 'COSMO', 'CPCM'):
            self.f_eps = (eps - 1.0) / eps
            # q = -f K^-1 v with K = S
            self._resp = -self.f_eps * np.linalg.inv(S)
        elif self.method in ('IEF-PCM', 'IEFPCM', 'SS(V)PE'):
            # double layer D_ij = (r_i - r_j).n_j / |r_i - r_j|^3;
            # diagonal from the sum rule sum_j D_ij a_j = -2 pi
            D = np.einsum('ijx,jx->ij', dvec, normals) / d ** 3
            np.fill_diagonal(D, 0.0)
            diag = -(2.0 * np.pi + (D * area[None, :]).sum(axis=1)
                     - np.diag(D) * area) / area
            np.fill_diagonal(D, diag)
            DA = D * area[None, :]
            f = (eps - 1.0) / (eps + 1.0)
            K = S - f / (2.0 * np.pi) * (DA @ S)
            Rmat = -f * (np.eye(n) - DA / (2.0 * np.pi))
            self.f_eps = f
            self._resp = np.linalg.solve(K, Rmat)
        else:
            raise NotImplementedError(self.method)
        self._v_ints = None     # (npts, nao, nao) potential integrals

    def _potential_ints(self):
        """<mu| 1/|r-s_k| |nu> for every surface point, batched through
        the int3c2e engine with sharp point-charge Gaussians
        (solvent/ddcosmo.py _point_charge_ints)."""
        if self._v_ints is not None:
            return self._v_ints
        from .ddcosmo import _point_charge_ints
        pts, _, _ = self.surface
        self._v_ints = _point_charge_ints(self.mol, pts)
        return self._v_ints

    def kernel(self, dm):
        """Solvation energy and Fock contribution for a given density."""
        pts, area, _ = self.surface
        z = np.asarray(self.mol.charges, dtype=float)
        Rn = np.asarray(self.mol.coords)
        v_nuc = (z[None, :] / np.linalg.norm(
            pts[:, None, :] - Rn[None, :, :], axis=2)).sum(axis=1)
        vints = self._potential_ints()
        dm_np = np.asarray(dm)
        v_ele = -np.einsum('kij,ji->k', vints, dm_np)
        v = v_nuc + v_ele
        q = self._resp @ v
        e_solv = 0.5 * float(q @ v)
        # Fock: dE/d dm = sum_k q_k dV_k/ddm = -sum_k q_k vints_k
        vfock = -jnp.asarray(np.einsum('k,kij->ij', q, vints))
        return e_solv, vfock


def pcm_for_scf(mf, eps=78.3553, n_ang=110, method='C-PCM'):
    """Attach C-PCM/IEF-PCM to a mean-field object
    (reference _attach_solvent)."""
    pcm = PCM(mf.mol, eps=eps, n_ang=n_ang, method=method)
    mf.with_solvent = pcm
    veff_orig = mf.get_veff
    eelec_orig = mf.energy_elec

    def get_veff(mol=None, dm=None, *args, **kwargs):
        v = veff_orig(mol, dm, *args, **kwargs)
        e_solv, vfock = pcm.kernel(dm)
        mf._e_solvent = e_solv
        return v + vfock

    def energy_elec(dm, h1e, vhf):
        # vhf includes the solvent Fock; correct double counting:
        # E = E_elec[vhf - vsolv] + e_solv
        e_solv, vfock = pcm.kernel(dm)
        e = eelec_orig(dm, h1e, vhf - vfock)
        return e + e_solv

    mf.get_veff = get_veff
    mf.energy_elec = energy_elec
    return mf


cosmo_for_scf = pcm_for_scf
