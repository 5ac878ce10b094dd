"""Multi-configurational SCF (analog of reference pyscf/mcscf)."""
from .casci import CASCI
from .mc1step import CASSCF
