"""Periodic MP2 (analog of reference pyscf/pbc/mp)."""
from .kmp2 import KMP2, eri_block
