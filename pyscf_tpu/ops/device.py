"""Device placement policy for integral generation.

Gaussian-integral generation runs ONCE per geometry and is dominated by
many small kernels over irregular shell-class shapes; the hot, iterated
math (SCF steps, XC quadrature, post-HF contractions) is large dense
tensor work. The TPU compiler pays seconds per program, which is the
right trade for the iterated path but a pure loss for one-shot integral
tables (reference generates them in C on the host too: libcint driven by
pyscf/gto/moleintor.py:41). So by default the integral *generation*
kernels run on the JAX CPU backend (native f64, millisecond compiles)
and the resulting tables are shipped to the accelerator once, where all
iterated compute happens.

Set PYSCF_TPU_INT_DEVICE=default to keep integral generation on the
default backend (e.g. to exercise the TPU integral path).
"""
import contextlib
import os

import jax

_PREF = os.environ.get('PYSCF_TPU_INT_DEVICE', 'cpu')


def _gen_device():
    """The device integral-generation kernels should run on (or None)."""
    if _PREF == 'default':
        return None
    try:
        if jax.default_backend() == 'cpu':
            return None
    except RuntimeError:
        # default backend failed to initialize (e.g. dead TPU tunnel with
        # JAX_PLATFORMS naming it). Retry with automatic backend selection
        # so the CPU-capable path keeps working (results/scaling_n2_qz.log
        # died here in round 4).
        import os
        os.environ['JAX_PLATFORMS'] = ''
        try:
            if jax.default_backend() == 'cpu':
                return None
        except RuntimeError:
            return None
    try:
        return jax.devices('cpu')[0]
    except RuntimeError:
        return None


@contextlib.contextmanager
def integral_compute():
    """Context: run enclosed jitted integral kernels on the CPU backend."""
    dev = _gen_device()
    if dev is None:
        yield
    else:
        with jax.default_device(dev):
            yield


def to_compute_device(x):
    """Move a finished integral table to the default (accelerator) device."""
    if _gen_device() is None:
        return x
    try:
        return jax.device_put(x, jax.devices()[0])
    except RuntimeError:
        return x


def on_integral_device(fn):
    """Decorator: run fn's kernels on the integral-generation device and
    ship its (pytree) result to the default device."""
    def wrapped(*args, **kwargs):
        with integral_compute():
            out = fn(*args, **kwargs)
        return jax.tree_util.tree_map(to_compute_device, out)
    wrapped.__name__ = getattr(fn, '__name__', 'wrapped')
    wrapped.__doc__ = fn.__doc__
    wrapped.__wrapped__ = fn
    return wrapped
