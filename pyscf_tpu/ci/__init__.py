"""Configuration interaction (analog of reference pyscf/ci)."""
from .rcisd import RCISD
from .cisd import CISD as CISD_det
from .gcisd import GCISD, UCISD

# reference ci.CISD(mf) on a closed-shell RHF is the spatial-orbital RCISD
CISD = RCISD
