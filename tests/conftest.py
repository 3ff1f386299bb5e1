"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip (and remote) in this environment; tests run
on CPU for speed and validate multi-chip sharding on virtual CPU devices per
the standard JAX recipe.  NOTE: the sandbox presets ``JAX_PLATFORMS=axon``
and the axon plugin wins over the env var, so we must override through
``jax.config`` before any backend is initialized.
"""

import os

# The TPU-mode lane (tests/test_tpu.py, `-m tpu`) runs on real hardware:
#   CRAFTER_TEST_PLATFORM=tpu python -m pytest tests -m tpu
# It asserts Mosaic==jnp bit-identity on device — the check interpret mode
# cannot make (CPU computes the balance kernel's one-hot matmuls in fp32,
# real TPUs in single-pass bf16; see step.py:_balance_core).
_PLATFORM = os.environ.get('CRAFTER_TEST_PLATFORM', 'cpu')
if _PLATFORM == 'cpu':
  os.environ['JAX_PLATFORMS'] = 'cpu'
  flags = os.environ.get('XLA_FLAGS', '')
  if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

if _PLATFORM == 'cpu':
  jax.config.update('jax_platforms', 'cpu')
  cache = '/tmp/jax_compile_cache_cpu'
else:
  cache = '/tmp/jax_compile_cache'
# Persistent compilation cache: the big jitted programs (vec_step variants,
# PPO update) dominate suite wall-time; repeated runs hit the cache.
jax.config.update('jax_compilation_cache_dir', cache)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
