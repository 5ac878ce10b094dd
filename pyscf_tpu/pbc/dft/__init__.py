from .rks import RKS
