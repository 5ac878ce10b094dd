"""GW / RPA methods (analog of reference pyscf/gw)."""
from .rpa import RPA, dRPA
from .gw_ac import GWAC, GW
from .bse import BSE
from .evgw import evGW
