"""Gamma-point periodic Hartree-Fock (analog of reference pyscf/pbc/scf/hf.py).

Reuses the molecular SCF driver; integrals come from the cell's FFTDF.
Exchange at Gamma uses the probe-charge (Madelung) correction for the
G=0 divergence (exxdiv='ewald', reference pbc/scf/khf.py).
"""
import numpy as np
import jax.numpy as jnp

from ...scf.hf import RHF as MolRHF
from ..df.fft import FFTDF


def madelung(cell, kpts=None):
    """Madelung constant of a probe charge in the neutralizing lattice.

    With k-point sampling, the probe lives in the Born-von-Karman
    supercell: the lattice is scaled by the Monkhorst-Pack mesh size per
    axis (reference pbc/tools/pbc.py:550)."""
    from ..gto.cell import Cell
    a = np.asarray(cell.lattice_vectors_)
    if kpts is not None:
        frac = np.asarray(kpts) @ a.T / (2.0 * np.pi)
        nk = [len(np.unique(np.round(frac[:, i], 8))) for i in range(3)]
        a = np.einsum('x,xi->xi', np.asarray(nk, float), a)
    probe = Cell(atom=[('H', (0.0, 0.0, 0.0))],
                 a=a, unit='bohr',
                 basis={'H': [[0, [1.0, 1.0]]]}, verbose=0,
                 precision=cell.precision)
    probe.build()
    probe.atom_charges_eff = np.array([1.0])
    return -2.0 * probe.ewald()


class RHF(MolRHF):
    exxdiv = 'ewald'
    _fused_kind = None   # FFTDF J/K build is host-driven (no cderi tensor)

    def __init__(self, cell, exxdiv='ewald'):
        super().__init__(cell)
        self.cell = cell
        self.exxdiv = exxdiv
        self.with_df = FFTDF(cell)

    def get_ovlp(self, mol=None):
        return self.with_df.get_ovlp()

    def get_hcore(self, mol=None):
        return self.with_df.get_hcore()

    def get_jk(self, mol=None, dm=None, hermi=1, with_j=True, with_k=True,
               omega=None):
        vj, vk = self.with_df.get_jk(dm, with_j=with_j, with_k=with_k)
        if with_k and self.exxdiv == 'ewald':
            # probe-charge correction: K += madelung * S dm S
            s = np.asarray(self.get_ovlp())
            mad = madelung(self.cell)
            vk = vk + mad * jnp.asarray(s @ np.asarray(dm) @ s)
        return vj, vk

    def energy_nuc(self):
        return self.cell.ewald()

    def density_fit(self, auxbasis=None):
        """Swap the JK engine to Γ-point Gaussian DF (pbc/df/gdf.py);
        hcore/overlap still come through the FFTDF machinery (GDF
        subclasses it)."""
        from ..df.gdf import GDF
        self.with_df = GDF(self.cell, auxbasis)
        return self
