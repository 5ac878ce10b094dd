"""Shared example-script setup: fall back to CPU if the configured JAX
platform cannot initialize (e.g. the TPU tunnel is down), BEFORE jax is
imported in this process. Keeps long scaling runs from dying on a
transient backend failure."""
import os
import subprocess
import sys

# silence the XLA CPU AOT pseudo-feature mismatch error spam before any
# jax import initializes C++ logging (see pyscf_tpu/__init__.py)
if not os.environ.get('PYSCF_TPU_KEEP_CLOGS'):
    os.environ['TF_CPP_MIN_LOG_LEVEL'] = '3'


def ensure_backend(probe_timeout=240):
    plat = os.environ.get('JAX_PLATFORMS', '')
    if not plat or plat == 'cpu':
        return
    try:
        probe = subprocess.run(
            [sys.executable, '-c', 'import jax; jax.devices()'],
            capture_output=True, timeout=probe_timeout)
        ok = probe.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        sys.stderr.write(f'[pyscf_tpu examples] JAX platform {plat!r} '
                         'failed to initialize; falling back to CPU\n')
        os.environ['JAX_PLATFORMS'] = 'cpu'
