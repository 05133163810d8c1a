"""Test configuration: run on a virtual 8-device CPU mesh.

The environment preloads jax through an axon-TPU site hook
(PYTHONPATH=/root/.axon_site) with JAX_PLATFORMS=axon already captured, so
environment variables set here are too late — use jax.config directly. This
is the TPU-world equivalent of a fake backend: sharding/collective tests run
against 8 virtual CPU devices (SURVEY §4).
"""

import os

# XLA flags are parsed at backend-client creation, which has not happened
# yet even though jax modules are pre-imported.
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: test runs are compile-bound on this box.
# LAST_TORCH_TPU_NO_CACHE=1 disables it (for measuring cache
# effectiveness; see CLAUDE.md's test wall-clock notes).
if not os.environ.get('LAST_TORCH_TPU_NO_CACHE'):
  jax.config.update(
      'jax_compilation_cache_dir',
      os.path.join(os.path.dirname(__file__), '..', '.jax_cache'))
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
  jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

# The default matmul precision on this backend is bfloat16-level; tests
# compare against float64 numpy oracles, so force true float32 matmuls.
# LAST_TORCH_TPU_FAST_PRECISION=1 leaves the backend default (for
# measuring the flag's wall-clock cost only — oracle tests will fail).
if not os.environ.get('LAST_TORCH_TPU_FAST_PRECISION'):
  jax.config.update('jax_default_matmul_precision', 'highest')
