"""Coupled cluster (analog of reference pyscf/cc)."""
from .ccsd import CCSD, RCCSD
from .gccsd import GCCSD, UCCSD
from .gccsdt import GCCSDT, CCSDT
from .qcisd import QCISD
from . import gccsd_t
from .bccd import bccd_kernel_
