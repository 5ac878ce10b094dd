"""Orbital localization (analog of reference pyscf/lo)."""
from . import boys
from . import pipek
from . import orth
from .boys import Boys
from .pipek import PipekMezey, PM
from .orth import orth_ao, lowdin
