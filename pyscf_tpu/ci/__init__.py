"""Configuration interaction (analog of reference pyscf/ci)."""
from .cisd import CISD, RCISD
