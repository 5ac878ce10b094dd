"""Periodic cell (analog of reference pyscf/pbc/gto/cell.py: Cell:1250,
make_kpts:827, get_Gv:525, ewald:696).

Subclasses the molecular Mole; adds lattice vectors, reciprocal mesh,
Ewald sums, GTH pseudopotential tables, and lattice-image generation for
the real-space integral lattice sums.
"""
import gzip
import json
import os

import numpy as np

from ...gto.mole import Mole
from ...lib.parameters import BOHR

_PP_DIR = os.path.join(os.path.dirname(__file__), 'pseudo_data')


def load_pseudo(family, symb):
    stem = family.lower().replace('-', '').replace('_', '')
    path = os.path.join(_PP_DIR, stem + '.json.gz')
    with gzip.open(path, 'rt') as f:
        data = json.load(f)
    if symb in data['default']:
        return data['default'][symb]
    key = f'{symb}:{family.upper()}'
    if key in data['variants']:
        return data['variants'][key]
    raise KeyError(f'no {family} pseudopotential for {symb}')


class Cell(Mole):
    def __init__(self, atom=None, a=None, basis='gth-szv', pseudo=None,
                 unit='angstrom', mesh=None, ke_cutoff=None, precision=1e-8,
                 dimension=3, **kwargs):
        super().__init__(atom=atom, basis=basis, unit=unit, **kwargs)
        self.a = a
        self.pseudo = pseudo
        self.mesh = mesh
        self.ke_cutoff = ke_cutoff
        self.precision = precision
        self.dimension = dimension

    def build(self, **kwargs):
        super().build(**kwargs)
        a = np.asarray(self.a, dtype=np.float64)
        if isinstance(self.unit, str) and self.unit.lower().startswith('a'):
            a = a / BOHR
        self.lattice_vectors_ = a                  # rows = lattice vectors
        self.reciprocal_vectors_ = 2 * np.pi * np.linalg.inv(a).T
        self.vol = abs(np.linalg.det(a))
        # pseudopotentials
        self._pseudo = {}
        if self.pseudo is not None:
            for symb in set(self.elements_):
                self._pseudo[symb] = load_pseudo(self.pseudo, symb)
        # effective (valence) charges
        self.atom_charges_eff = np.array([
            float(sum(self._pseudo[s]['nelec'])) if s in self._pseudo
            else float(z)
            for s, z in zip(self.elements_, self.charges)])
        # real-space cutoff: pair overlap of the two most diffuse primitives
        # decays as exp(-(min_exp/2) R^2); pad precision for the image count.
        min_exp = min(float(sh.exps.min()) for sh in self._shells)
        # pair decay exp(-(min_exp/2) R^2) with polynomial prefactors:
        # pad the log and add a safety factor (kinetic sums converge
        # slower than overlap; validated against 2x1x1-vs-supercell
        # identity to <1e-12)
        self.rcut = 1.4 * np.sqrt(
            2.0 * max(-np.log(self.precision * 1e-4), 5.0) / min_exp)
        # mesh from ke_cutoff estimate
        if self.mesh is None:
            if self.ke_cutoff is None:
                max_exp = max(float(sh.exps.max()) for sh in self._shells)
                self.ke_cutoff = 2.0 * max_exp * (-np.log(self.precision))
            gmax = np.sqrt(2.0 * self.ke_cutoff)
            bnorm = np.linalg.norm(self.reciprocal_vectors_, axis=1)
            self.mesh = [int(2 * np.ceil(gmax / b) + 1) for b in bnorm]
        return self

    def lattice_vectors(self):
        return self.lattice_vectors_

    def reciprocal_vectors(self):
        return self.reciprocal_vectors_

    @property
    def nelectron(self):
        return int(self.atom_charges_eff.sum()) - self.charge

    def get_lattice_Ls(self, rcut=None):
        """Integer lattice translations with |T| <= rcut (cartesian)."""
        rcut = rcut if rcut is not None else self.rcut
        a = self.lattice_vectors_
        nimg = np.ceil(rcut / np.linalg.norm(a, axis=1)).astype(int) + 1
        rng = [np.arange(-n, n + 1) for n in nimg]
        mg = np.meshgrid(*rng, indexing='ij')
        ints = np.stack([m.ravel() for m in mg], axis=1)
        Ls = ints @ a
        keep = np.linalg.norm(Ls, axis=1) <= rcut + 1e-9
        return Ls[keep]

    def get_Gv(self, mesh=None):
        """Reciprocal lattice vectors of the FFT mesh, (ngrid, 3)."""
        mesh = mesh or self.mesh
        b = self.reciprocal_vectors_
        gx = [np.fft.fftfreq(n, 1.0 / n) for n in mesh]
        mg = np.meshgrid(*gx, indexing='ij')
        ints = np.stack([m.ravel() for m in mg], axis=1)
        return ints @ b

    def get_uniform_grids(self, mesh=None):
        """Real-space uniform grid points, (ngrid, 3)."""
        mesh = self.mesh if mesh is None else mesh
        a = self.lattice_vectors_
        frac = [np.arange(n) / n for n in mesh]
        mg = np.meshgrid(*frac, indexing='ij')
        f = np.stack([m.ravel() for m in mg], axis=1)
        return f @ a

    def make_kpts(self, nks, with_gamma_point=True):
        """Monkhorst-Pack k-point mesh (scaled -> cartesian)."""
        ks = []
        for n in nks:
            if with_gamma_point:
                ks.append(np.arange(n) / n)
            else:
                ks.append((np.arange(n) + 0.5) / n - 0.5)
        mg = np.meshgrid(*ks, indexing='ij')
        scaled = np.stack([m.ravel() for m in mg], axis=1)
        scaled = np.where(scaled > 0.5 - 1e-9, scaled - 1.0, scaled)
        return scaled @ self.reciprocal_vectors_

    def energy_nuc(self):
        return self.ewald()

    def ewald(self, ew_eta=None, ew_cut=None):
        """Ewald sum of the (effective) point charges in the lattice."""
        chg = self.atom_charges_eff
        coords = self.coords
        vol = self.vol
        if ew_eta is None:
            ew_eta = np.sqrt(np.pi) * (len(chg) / vol ** 2) ** (1.0 / 6) \
                + 1e-30
            ew_eta = max(ew_eta, 0.5)
        log_prec = -np.log(self.precision * 1e-2)
        rcut = np.sqrt(log_prec) / ew_eta
        gcut = 2.0 * ew_eta * np.sqrt(log_prec)
        from scipy.special import erfc
        # real-space
        Ls = self.get_lattice_Ls(rcut + np.linalg.norm(
            self.lattice_vectors_, axis=1).max())
        e_real = 0.0
        for L in Ls:
            d = coords[:, None, :] - coords[None, :, :] + L
            r = np.linalg.norm(d, axis=2)
            if np.allclose(L, 0):
                np.fill_diagonal(r, np.inf)
            e_real += 0.5 * np.sum(np.outer(chg, chg) * erfc(ew_eta * r) / r)
        # self + background
        e_self = -ew_eta / np.sqrt(np.pi) * np.sum(chg ** 2)
        e_bg = -np.pi / (2 * ew_eta ** 2 * vol) * np.sum(chg) ** 2
        # reciprocal
        b = self.reciprocal_vectors_
        nmax = np.ceil(gcut / np.linalg.norm(b, axis=1)).astype(int) + 1
        rng = [np.arange(-n, n + 1) for n in nmax]
        mg = np.meshgrid(*rng, indexing='ij')
        ints = np.stack([m.ravel() for m in mg], axis=1)
        Gs = ints @ b
        G2 = np.einsum('ix,ix->i', Gs, Gs)
        keep = G2 > 1e-12
        Gs, G2 = Gs[keep], G2[keep]
        SI = chg @ np.exp(-1j * coords @ Gs.T)
        e_recip = (2 * np.pi / vol) * np.sum(
            np.abs(SI) ** 2 * np.exp(-G2 / (4 * ew_eta ** 2)) / G2)
        return float(e_real + e_self + e_bg + e_recip)


def M(**kwargs):
    return Cell(**kwargs).build()
