"""Moller-Plesset perturbation theory (analog of reference pyscf/mp)."""
from .mp2 import MP2, RMP2
from .ump2 import UMP2
from .gmp2 import GMP2
