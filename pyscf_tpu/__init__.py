"""pyscf_tpu: a TPU-native quantum chemistry framework (JAX/XLA/Pallas).

Re-designed from scratch with the capabilities of PySCF (reference:
pyscf/pyscf v2.14.0): Gaussian integrals as batched McMurchie-Davidson
kernels, SCF/DFT/post-HF as jitted XLA graphs, multi-chip scaling via
jax.sharding meshes.
"""
__version__ = '0.1.0'

import jax

# Quantum chemistry needs 1e-8 Ha accuracy: run in float64 (TPU emulates f64;
# hot kernels downcast internally where validated).
jax.config.update('jax_enable_x64', True)

# Persistent compilation cache: the integral engine compiles one kernel per
# angular-momentum class pair, reused across runs/geometries.
import os as _os  # noqa: E402

_cache_dir = _os.environ.get('PYSCF_TPU_JIT_CACHE',
                             _os.path.expanduser('~/.cache/pyscf_tpu_jit'))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', _cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
except Exception:
    pass

from .gto.mole import M, Mole  # noqa: E402


def __getattr__(name):
    import importlib
    if name in ('gto', 'scf', 'dft', 'df', 'ao2mo', 'mp', 'cc', 'fci',
                'mcscf', 'tdscf', 'grad', 'hessian', 'lib', 'lo', 'tools',
                'solvent', 'pbc', 'parallel'):
        return importlib.import_module('.' + name, __name__)
    raise AttributeError(name)
