"""End-to-end PPO throughput at a given batch size (VERDICT r1 item 7).

Measures the full training loop — rollout (env tick + pixel render + CNN
forward + sampling), GAE, epochs x minibatch SGD, on-device episode-stat
packing — on the local accelerator, and prints a JSON line.

    python tools/bench_ppo.py --num_envs 4096 --updates 5
"""

import pathlib as _pathlib
import sys as _sys

# Runnable as a plain script: put the repo root on sys.path so
# crafter_tpu imports without an installed package.
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import json
import time


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--num_envs', type=int, default=4096)
  parser.add_argument('--rollout', type=int, default=64)
  parser.add_argument('--updates', type=int, default=5)
  parser.add_argument('--minibatches', type=int, default=8)
  parser.add_argument('--epochs', type=int, default=3)
  args = parser.parse_args()

  from crafter_tpu.utils import apply_platform_env, enable_compile_cache
  apply_platform_env()
  enable_compile_cache()
  import jax
  from crafter_tpu.config import EnvConfig
  from crafter_tpu.ppo import PPO, PPOConfig

  env_cfg = EnvConfig()
  cfg = PPOConfig(num_envs=args.num_envs, rollout_len=args.rollout,
                  minibatches=args.minibatches, epochs=args.epochs,
                  reset_batch=max(32, args.num_envs // 128))
  ppo = PPO(env_cfg, cfg)
  ts = ppo.init(jax.random.key(0))
  train_step = jax.jit(ppo.train_step_with_stats)

  t0 = time.time()
  ts, metrics, stats = train_step(ts)
  float(metrics['loss'])  # host copy: the only reliable completion
  compile_s = time.time() - t0  # barrier through the device tunnel (PERF.md)

  t0 = time.time()
  for _ in range(args.updates):
    ts, metrics, stats = train_step(ts)
  float(metrics['loss'])
  dt = time.time() - t0
  steps = args.updates * args.num_envs * args.rollout
  sps = steps / dt
  print(json.dumps(dict(
      metric='ppo_env_steps_per_s', value=round(sps),
      num_envs=args.num_envs, rollout=args.rollout,
      updates=args.updates, compile_s=round(compile_s, 1),
      episodes_done=int(stats['count']),
      wall_s=round(dt, 2))), flush=True)


if __name__ == '__main__':
  main()
