from .hf import RHF
