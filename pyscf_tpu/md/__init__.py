"""Born-Oppenheimer molecular dynamics (analog of reference
pyscf/md/integrators.py: VelocityVerlet:427, NVTBerendson:504)."""
import numpy as np

from ..data.elements import MASSES
from ..lib.parameters import AMU2AU, BOLTZMANN_AU


class Frame:
    def __init__(self, coords, veloc, energy, time):
        self.coords = coords
        self.veloc = veloc
        self.energy = energy
        self.time = time


class VelocityVerlet:
    """NVE BOMD. grad_factory(mol) -> (e_tot, grad (natm,3))."""

    def __init__(self, mol, grad_factory, dt=10.0, steps=10, veloc=None):
        self.mol = mol.copy()
        self.grad_factory = grad_factory
        self.dt = dt
        self.steps = steps
        masses = np.array([MASSES[z] for z in mol.charges]) * AMU2AU
        self.masses = masses[:, None]
        self.veloc = (np.zeros((mol.natm, 3)) if veloc is None
                      else np.asarray(veloc))
        self.frames = []

    def kernel(self):
        mol = self.mol
        e, g = self.grad_factory(mol)
        acc = -np.asarray(g) / self.masses
        t = 0.0
        for step in range(self.steps):
            coords = np.asarray(mol.coords) + self.veloc * self.dt \
                + 0.5 * acc * self.dt ** 2
            mol.set_geom_(coords)
            e, g = self.grad_factory(mol)
            acc_new = -np.asarray(g) / self.masses
            self.veloc = self.veloc + 0.5 * (acc + acc_new) * self.dt
            acc = acc_new
            t += self.dt
            ekin = float(0.5 * (self.masses * self.veloc ** 2).sum())
            self.frames.append(Frame(coords.copy(), self.veloc.copy(),
                                     float(e) + ekin, t))
        return self.frames

    run = kernel

    @property
    def ekin(self):
        return float(0.5 * (self.masses * self.veloc ** 2).sum())


class NVTBerendson(VelocityVerlet):
    """Berendsen-thermostat NVT BOMD."""

    def __init__(self, mol, grad_factory, T=300.0, taut=500.0, **kwargs):
        super().__init__(mol, grad_factory, **kwargs)
        self.T = T
        self.taut = taut

    def kernel(self):
        ndof = 3 * self.mol.natm
        frames = []
        mol = self.mol
        e, g = self.grad_factory(mol)
        acc = -np.asarray(g) / self.masses
        t = 0.0
        for step in range(self.steps):
            coords = np.asarray(mol.coords) + self.veloc * self.dt \
                + 0.5 * acc * self.dt ** 2
            mol.set_geom_(coords)
            e, g = self.grad_factory(mol)
            acc_new = -np.asarray(g) / self.masses
            self.veloc = self.veloc + 0.5 * (acc + acc_new) * self.dt
            # Berendsen rescale
            ekin = 0.5 * (self.masses * self.veloc ** 2).sum()
            T_now = 2.0 * ekin / (ndof * BOLTZMANN_AU) if ekin > 0 else 1e-10
            lam = np.sqrt(max(1.0 + self.dt / self.taut
                              * (self.T / T_now - 1.0), 1e-10))
            self.veloc *= lam
            acc = acc_new
            t += self.dt
            frames.append(Frame(coords.copy(), self.veloc.copy(),
                                float(e), t))
        self.frames = frames
        return frames
