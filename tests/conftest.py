"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip (and remote) in this environment; tests run
on CPU for speed and validate multi-chip sharding on virtual CPU devices per
the standard JAX recipe.  NOTE: the sandbox presets ``JAX_PLATFORMS=axon``
and the axon plugin wins over the env var, so we must override through
``jax.config`` before any backend is initialized.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# Persistent compilation cache: the big jitted programs (vec_step variants,
# PPO update) dominate suite wall-time; repeated runs hit the cache.
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_compile_cache_cpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
