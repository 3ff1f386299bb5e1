"""Host/platform helpers shared by the CLIs and benchmarks."""

from __future__ import annotations

import os


def apply_platform_env() -> None:
  """Honor `JAX_PLATFORMS` explicitly.

  Preinstalled accelerator plugins can take priority over the env var in
  some sandboxes; forcing it through jax.config makes `JAX_PLATFORMS=cpu
  python -m crafter_tpu.run_random` behave as users expect.  Must run
  before any JAX backend initializes.
  """
  platforms = os.environ.get('JAX_PLATFORMS')
  if platforms:
    import jax
    jax.config.update('jax_platforms', platforms)


def enable_compile_cache(path: str = '/tmp/jax_compile_cache') -> None:
  """Persistent XLA compilation cache (big win on slow remote compiles)."""
  import jax
  try:
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
  except Exception:
    pass
