"""Test configuration: run on CPU with 8 virtual devices for sharding tests.

Must run before any JAX backend initialization (the environment's
sitecustomize pre-imports jax with an 'axon' TPU platform; tests need the
host CPU so they are runnable anywhere and can fake an 8-device mesh).
"""
import os

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
