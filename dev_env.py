"""Import first in dev scripts to force CPU execution: `import dev_env`."""
import os
os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')
import jax
jax.config.update('jax_platforms', 'cpu')
