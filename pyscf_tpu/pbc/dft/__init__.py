from .rks import RKS
from .krks import KRKS
from .kuks import KUKS
