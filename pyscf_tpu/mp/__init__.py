"""Moller-Plesset perturbation theory (analog of reference pyscf/mp)."""
from .mp2 import MP2, RMP2
