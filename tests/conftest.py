"""Test configuration: run on a virtual 8-device CPU mesh.

Must set the environment before jax is imported anywhere. This is the
TPU-world equivalent of a fake backend: sharding/collective tests run
against 8 virtual CPU devices (SURVEY §4).
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

# Persistent compilation cache: test runs are compile-bound on CPU. The env
# vars are not honored by this jax version, so use jax.config directly.
import jax  # noqa: E402

jax.config.update(
    'jax_compilation_cache_dir',
    os.path.join(os.path.dirname(__file__), '..', '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
