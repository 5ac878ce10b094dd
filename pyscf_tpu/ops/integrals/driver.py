"""Integral name dispatcher (analog of reference pyscf/gto/moleintor.py:41).

Maps libcint-style integral names onto the batched MD kernels.
"""
from . import int1e


def intor(mol, name, **kwargs):
    name = name.replace('_sph', '')
    if name == 'int1e_ovlp':
        return int1e.int1e_ovlp(mol)
    if name == 'int1e_kin':
        return int1e.int1e_kin(mol)
    if name == 'int1e_nuc':
        return int1e.int1e_nuc(mol)
    if name == 'int1e_r':
        return int1e.int1e_r(mol)
    if name == 'int2e':
        from . import int2e
        return int2e.int2e(mol)
    if name == 'int2c2e':
        from . import int2e
        return int2e.int2c2e(mol)
    if name.startswith('ECPscalar'):
        from . import ecp
        return ecp.ecp_scalar(mol)
    raise NotImplementedError(f'integral {name}')
