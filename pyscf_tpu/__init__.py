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

# Persistent compilation cache: OPT-IN via PYSCF_TPU_JIT_CACHE=<dir>.
# Measured on the TPU backend here, cache writes add 2-7 s per compile and
# reads do not amortize, so it is off by default; compile latency is instead
# managed by running one-shot integral generation on the CPU backend
# (ops/device.py) and fusing the iterated SCF math into few programs.
import os as _os  # noqa: E402

_cache_dir = _os.environ.get('PYSCF_TPU_JIT_CACHE')
if _cache_dir:
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
