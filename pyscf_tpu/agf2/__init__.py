"""Auxiliary second-order Green's function perturbation theory (AGF2).

Reference analog: pyscf/agf2 (ragf2.py, aux_space.py, chempot.py,
C kernels lib/agf2/ragf2.c).
"""
import numpy as np

from .ragf2 import RAGF2
from .uagf2 import UAGF2


def AGF2(mf, frozen=None):
    """Dispatch on the mean-field kind (reference agf2.AGF2)."""
    if getattr(mf, '_fused_kind', None) == 'unrestricted' or \
            np.ndim(getattr(mf, 'mo_energy', None)) == 2:
        return UAGF2(mf, frozen=frozen)
    return RAGF2(mf, frozen=frozen)


__all__ = ['RAGF2', 'UAGF2', 'AGF2']
