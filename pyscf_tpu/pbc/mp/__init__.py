"""Periodic MP2 (analog of reference pyscf/pbc/mp)."""
from .kmp2 import KMP2, eri_block
from .kmp2_sharded import kernel_sharded as kmp2_sharded
