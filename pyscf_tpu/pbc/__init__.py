"""Periodic boundary conditions (analog of reference pyscf/pbc)."""
from . import gto
