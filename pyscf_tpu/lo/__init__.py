"""Orbital localization (analog of reference pyscf/lo)."""
from .boys import Boys
