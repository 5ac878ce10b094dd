"""Auxiliary second-order Green's function perturbation theory (AGF2).

Reference analog: pyscf/agf2 (ragf2.py, aux_space.py, chempot.py,
C kernels lib/agf2/ragf2.c).
"""
from .ragf2 import RAGF2

__all__ = ['RAGF2']
