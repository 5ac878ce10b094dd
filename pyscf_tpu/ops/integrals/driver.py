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
        import os
        import jax
        mode = os.environ.get('PYSCF_TPU_INT2E')
        try:
            accel = jax.default_backend() != 'cpu'
        except RuntimeError:
            accel = False
        # v2 (ops/integrals/j2e.py): screened, sph-folded, device-resident.
        # Default on accelerators (host generation is 30+ min at
        # N2/cc-pVQZ); the legacy host engine stays the CPU default
        # because the merged class-pair programs cost ~25 min of XLA:CPU
        # compile on this 1-core host vs ~40 s of legacy execution.
        if mode == 'v2' or (accel and mode != 'legacy'):
            from . import j2e
            return j2e.int2e_dense(mol)
        from . import int2e
        return int2e.int2e(mol)
    if name == 'int2c2e':
        from . import int2e
        return int2e.int2c2e(mol)
    if name.startswith('ECPscalar'):
        from . import ecp
        return ecp.ecp_scalar(mol)
    raise NotImplementedError(f'integral {name}')
