from .hf import RHF
from .khf import KRHF
from .kuhf import KUHF
