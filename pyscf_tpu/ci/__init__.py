"""Configuration interaction (analog of reference pyscf/ci)."""
from .cisd_amp import CISD
from .cisd import CISD as CISD_det

RCISD = CISD
from .gcisd import GCISD, UCISD
