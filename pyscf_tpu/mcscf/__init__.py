"""Multi-configurational SCF (analog of reference pyscf/mcscf)."""
from .casci import CASCI
from .mc1step import CASSCF
from .addons import state_average_, state_average, SAFCISolver
from .avas import avas
