"""Benchmark: env-steps/s of the batched engine on the local accelerator.

Prints ONE JSON line: the headline metric is env-steps/s at 4096 batched
envs for the state-only NoReward loop (BASELINE.json config 2), with the
full pixel pipeline (config 3) reported alongside on stderr.
``vs_baseline`` is measured throughput over the north-star target of
1M env-steps/s/chip (the reference publishes no throughput; its harness is
crafter/run_random.py:28-43).

The loop includes everything a training run pays: action sampling, the
simulation tick, chunk balancing, and partial-batch auto-reset worldgen.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def bench_engine(num_envs=4096, scan_len=100, repeats=5, render=False,
                 reset_batch=128):
  from crafter_tpu.config import EnvConfig
  from crafter_tpu.env import CrafterEnv, home_keys, vec_reset, vec_step

  cfg = EnvConfig(reward=False)
  core = CrafterEnv(cfg) if render else None

  @jax.jit
  def init(seed):
    return vec_reset(home_keys(seed, num_envs), cfg)

  @jax.jit
  def loop(vs, key):
    def body(carry, _):
      vs, key = carry
      key, k_act = jax.random.split(key)
      actions = jax.random.randint(k_act, (num_envs,), 0, 17)
      vs, out, _ = vec_step(vs, actions, cfg, reset_batch)
      aggr = out.done.sum()
      if render:
        obs = jax.vmap(core.observe)(vs.env)
        aggr = aggr + (obs[..., 0, 0, 0].astype(jnp.int32)).sum() * 0
      return (vs, key), aggr
    (vs, key), dones = jax.lax.scan(body, (vs, key), None, length=scan_len)
    return vs, dones.sum()

  vs = jax.block_until_ready(init(0))
  vs, _ = loop(vs, jax.random.key(0))  # compile + warmup
  jax.block_until_ready(vs)

  best = 0.0
  for r in range(repeats):
    t0 = time.perf_counter()
    vs, dones = loop(vs, jax.random.key(r + 1))
    jax.block_until_ready(dones)
    dt = time.perf_counter() - t0
    best = max(best, num_envs * scan_len / dt)
  return best


def main():
  num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
  scan_len = int(sys.argv[2]) if len(sys.argv) > 2 else 100
  state_sps = bench_engine(num_envs, scan_len, render=False)
  print(f'device={jax.devices()[0].platform} envs={num_envs} '
        f'state-only={state_sps:,.0f} steps/s', file=sys.stderr)
  try:
    pixel_sps = bench_engine(num_envs, max(scan_len // 4, 10), render=True)
    print(f'pixel={pixel_sps:,.0f} steps/s', file=sys.stderr)
  except Exception as e:  # keep the headline even if the pixel pass fails
    print(f'pixel bench failed: {e}', file=sys.stderr)
  print(json.dumps({
      'metric': f'env-steps/s @ {num_envs} envs (state-only engine loop)',
      'value': round(state_sps),
      'unit': 'env-steps/s',
      'vs_baseline': round(state_sps / 1_000_000, 4),
  }))


if __name__ == '__main__':
  main()
