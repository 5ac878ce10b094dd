"""Density fitting (analog of reference pyscf/df)."""
from .df import DF
from .addons import make_auxbasis, make_auxmol
from .autoaux import autoaux
from .df_jk import density_fit
