"""Molecular properties (analog of reference pyscf.prop extension)."""
from .polarizability import Polarizability
