"""Nuclear gradients (analog of reference pyscf/grad)."""
from . import rhf
from .rhf import finite_difference_gradient
