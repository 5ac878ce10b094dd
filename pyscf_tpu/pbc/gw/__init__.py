"""k-point GW/RPA (analog of reference pyscf/pbc/gw)."""
from .krpa import KRPA
