"""Mean-field methods (analog of reference pyscf/scf/__init__.py factories)."""
from .hf import RHF, SCF


def HF(mol, **kwargs):
    if mol.spin == 0 and mol.nelectron % 2 == 0:
        return RHF(mol, **kwargs)
    from .uhf import UHF as _UHF
    return _UHF(mol, **kwargs)


def UHF(mol, **kwargs):
    from .uhf import UHF as _UHF
    return _UHF(mol, **kwargs)


def ROHF(mol, **kwargs):
    from .rohf import ROHF as _ROHF
    return _ROHF(mol, **kwargs)
