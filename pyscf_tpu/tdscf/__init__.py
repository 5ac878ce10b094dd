"""Time-dependent SCF (analog of reference pyscf/tdscf)."""
from .rhf import TDA, TDHF, TDDFT, get_ab
from .uhf import TDAUHF, TDAUKS
