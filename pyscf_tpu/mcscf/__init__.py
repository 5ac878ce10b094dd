"""Multi-configurational SCF (analog of reference pyscf/mcscf)."""
from .casci import CASCI
from .mc1step import CASSCF
from .addons import state_average_, state_average, SAFCISolver
from .avas import avas
from .dmet_cas import guess_cas as dmet_cas_guess
