"""k-point time-dependent mean-field (analog of reference pyscf/pbc/tdscf)."""
from .krhf import KTDA
