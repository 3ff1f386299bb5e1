"""One-off: time step_group_batch at several kernel block sizes."""

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import time

from crafter_tpu.utils import apply_platform_env, enable_compile_cache

apply_platform_env()
enable_compile_cache()

import jax
import jax.numpy as jnp

from crafter_tpu.config import EnvConfig
from crafter_tpu import step as step_lib
from crafter_tpu.env import home_keys, vec_reset_chunked

N = int(_sys.argv[1]) if len(_sys.argv) > 1 else 4096
BLOCKS = [int(b) for b in _sys.argv[2:]] or [16, 32, 64]
GROUPS = 40

cfg = EnvConfig(reward=False)
kk = cfg.balance_every
vs = vec_reset_chunked(home_keys(0, N), cfg)
float(vs.env.step.sum())

for block in BLOCKS:
  @jax.jit
  def loop(env, key, block=block):
    def body(carry, _):
      env, key = carry
      key, k_act = jax.random.split(key)
      actions = jax.random.randint(k_act, (kk, N), 0, 17)
      env, raw, occ = step_lib.step_group_batch(env, actions, cfg,
                                                block=block)
      return (env, key), raw.done.sum()
    (env, key), d = jax.lax.scan(body, (env, key), None, length=GROUPS)
    return env, d.sum()

  env, d = loop(vs.env, jax.random.key(0))
  float(d)  # compile + warmup barrier
  best = float('inf')
  for r in range(3):
    t0 = time.perf_counter()
    env2, d = loop(env, jax.random.key(r + 1))
    float(d)
    dt = time.perf_counter() - t0
    assert bool(jnp.all(env2.step - env.step == GROUPS * kk))
    best = min(best, dt)
    env = env2
  per_tick = best / (GROUPS * kk) * 1e3
  print(f'block={block}: {per_tick:.3f} ms/tick '
        f'({N * GROUPS * kk / best / 1e3:,.0f}k steps/s kernel-only loop)')
