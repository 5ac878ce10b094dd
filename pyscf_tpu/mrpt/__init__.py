"""Multireference perturbation theory (reference analog: pyscf/mrpt)."""
from .nevpt2 import NEVPT, sc_nevpt2

__all__ = ['NEVPT', 'sc_nevpt2']
