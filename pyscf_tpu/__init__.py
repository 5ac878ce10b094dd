"""pyscf_tpu: a TPU-native quantum chemistry framework (JAX/XLA/Pallas).

Re-designed from scratch with the capabilities of PySCF (reference:
pyscf/pyscf v2.14.0): Gaussian integrals as batched McMurchie-Davidson
kernels, SCF/DFT/post-HF as jitted XLA graphs, multi-chip scaling via
jax.sharding meshes.
"""
__version__ = '0.1.0'

import os as _os_pre

# XLA:CPU AOT cache entries embed compile-tuning pseudo-features
# (+prefer-no-scatter/gather) that never appear in the host CPU feature
# detection, so every persistent-cache load logs a full-page ERROR that is
# noise (the entries load and run fine; real failures still raise Python
# exceptions). Silence C++ ERROR logs unless the user asked for them.
# (the interpreter environment ships TF_CPP_MIN_LOG_LEVEL=1 via site
# customization, so override rather than setdefault; opt out with
# PYSCF_TPU_KEEP_CLOGS=1)
if not _os_pre.environ.get('PYSCF_TPU_KEEP_CLOGS'):
    _os_pre.environ['TF_CPP_MIN_LOG_LEVEL'] = '3'

import jax  # noqa: E402

# Quantum chemistry needs 1e-8 Ha accuracy: run in float64 (TPU emulates f64;
# hot kernels downcast internally where validated).
jax.config.update('jax_enable_x64', True)

# Persistent compilation cache: ON by default (~/.cache/pyscf_tpu/jit).
# On the TPU backend here a single XLA compile round-trips a remote
# compile service at 30-90 s/program; the disk cache turns every repeat
# compile (across processes) into a sub-second read. Measured: an 88.5 s
# compile replays in 0.49 s from a second process. Override the location
# with PYSCF_TPU_JIT_CACHE=<dir>, or disable with PYSCF_TPU_JIT_CACHE=0.
import os as _os  # noqa: E402

_cache_dir = _os.environ.get('PYSCF_TPU_JIT_CACHE')
if _cache_dir is None:
    # key the default cache dir by the host CPU model: XLA:CPU AOT entries
    # embed the compile machine's feature set, and replaying them on a
    # different host warns (or SIGILLs). TPU entries are unaffected.
    def _host_tag():
        import hashlib
        try:
            key = b''
            with open('/proc/cpuinfo') as f:
                for line in f:
                    # hash model name AND the feature flags: cloud hosts
                    # share a model string across generations whose AVX512
                    # subsets differ, and a stale AOT entry then SIGILLs
                    if line.startswith(('model name', 'flags')):
                        key += line.encode()
                        if line.startswith('flags'):
                            break
            if key:
                return hashlib.sha1(key).hexdigest()[:10]
        except OSError:
            pass
        import platform
        return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]
    _cache_dir = _os.path.join(
        _os.path.expanduser('~'), '.cache', 'pyscf_tpu',
        'jit-' + _host_tag())
if _cache_dir not in ('0', ''):
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', _cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
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
