"""DFT (analog of reference pyscf/dft)."""
from .rks import RKS
from .uks import UKS
from .roks import ROKS
from .gks import GKS
from . import gen_grid, radi, xc
from .numint import NumInt
Grids = gen_grid.Grids


def KS(mol, xc='lda,vwn'):
    if mol.spin == 0:
        return RKS(mol, xc=xc)
    return UKS(mol, xc=xc)
from .rkspu import RKSpU, linear_response_u
