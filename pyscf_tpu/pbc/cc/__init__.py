"""Periodic coupled cluster (analog of reference pyscf/pbc/cc)."""
from .kccsd import KRCCSD, KCCSD
