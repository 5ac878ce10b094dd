"""PBC tools (analog of reference pyscf/pbc/tools/pbc.py: fft:157,
get_coulG:258, madelung:550, super_cell:681)."""
import numpy as np


def fft(f, mesh):
    """FFT of a (batched) real-space periodic function on the mesh."""
    f = np.asarray(f)
    lead = f.shape[:-1]
    return np.fft.fftn(f.reshape(*lead, *mesh),
                       axes=(-3, -2, -1)).reshape(*lead, -1)


def ifft(g, mesh):
    g = np.asarray(g)
    lead = g.shape[:-1]
    return np.fft.ifftn(g.reshape(*lead, *mesh),
                        axes=(-3, -2, -1)).reshape(*lead, -1)


def get_coulG(cell, k=None, mesh=None, exx=False):
    """4 pi / |G + k|^2 on the FFT mesh; G+k = 0 entry set to 0
    (the Ewald probe-charge exxdiv correction is applied separately)."""
    mesh = mesh or cell.mesh
    Gv = cell.get_Gv(mesh)
    if k is not None:
        Gv = Gv + np.asarray(k)
    G2 = np.einsum('ix,ix->i', Gv, Gv)
    return np.where(G2 > 1e-12, 4.0 * np.pi / np.maximum(G2, 1e-30), 0.0)


def madelung(cell, kpts=None):
    from ..scf.hf import madelung as _mad
    return _mad(cell)


def super_cell(cell, ncopy):
    """Replicate the cell ncopy = [n1, n2, n3] times (reference
    pbc/tools/pbc.py:681). AO/atom order: image-major, matching k2gamma."""
    a = np.asarray(cell.lattice_vectors_)
    atoms = []
    for i in range(ncopy[0]):
        for j in range(ncopy[1]):
            for k in range(ncopy[2]):
                shift = i * a[0] + j * a[1] + k * a[2]
                for symb, r in zip(cell.elements_, np.asarray(cell.coords)):
                    atoms.append((symb, tuple(r + shift)))
    from ..gto.cell import Cell
    newcell = Cell(atom=atoms,
                   a=np.einsum('i,ij->ij', np.asarray(ncopy, float), a),
                   unit='bohr', basis=cell.basis, pseudo=cell.pseudo,
                   mesh=[n * c for n, c in zip(cell.mesh, ncopy)],
                   precision=cell.precision, verbose=0)
    return newcell.build()

from . import k2gamma
from .k2gamma import k2gamma_mo
