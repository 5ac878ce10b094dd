"""Coupled cluster (analog of reference pyscf/cc)."""
from .ccsd import CCSD, RCCSD
from .gccsd import GCCSD, UCCSD
