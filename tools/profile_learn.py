"""Device-trace the PPO learn stage (GAE + SGD epochs) and print top ops.

tools/ppo_budget.py says WHICH stage is slow; this says WHY — the same
hlo_stats view as tools/profile_summary.py, aimed at `PPO._learn`:

    python tools/profile_learn.py --num_envs 4096 --rollout 64 --iters 3
"""

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse

from profile_summary import summarize


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--num_envs', type=int, default=4096)
  parser.add_argument('--rollout', type=int, default=64)
  parser.add_argument('--iters', type=int, default=3)
  parser.add_argument('--top', type=int, default=25)
  parser.add_argument('--stage', choices=['learn', 'rollout', 'full'],
                      default='learn')
  args = parser.parse_args()

  from crafter_tpu.utils import apply_platform_env, enable_compile_cache
  apply_platform_env()
  enable_compile_cache()
  import jax
  from crafter_tpu.config import EnvConfig
  from crafter_tpu.ppo import PPO, PPOConfig

  env_cfg = EnvConfig()
  cfg = PPOConfig(num_envs=args.num_envs, rollout_len=args.rollout,
                  reset_batch=max(32, args.num_envs // 128))
  ppo = PPO(env_cfg, cfg)
  ts = ppo.init(jax.random.key(0))
  float(ts.env_steps)

  if args.stage == 'full':
    f = jax.jit(ppo.train_step)
    run = lambda: float(f(ts)[1]['loss'])
  elif args.stage == 'rollout':
    f = jax.jit(ppo._rollout)
    run = lambda: float(f(ts)[2].sum())
  else:
    roll = jax.jit(ppo._rollout)(ts)
    float(roll[2].sum())
    _, traj, last_value = roll
    f = jax.jit(ppo._learn)
    run = lambda: float(f(ts, traj, last_value)[1]['loss'])

  run()  # compile + warmup
  trace_dir = '/tmp/crafter_trace_learn'
  jax.profiler.start_trace(trace_dir)
  for _ in range(args.iters):
    run()
  jax.profiler.stop_trace()
  summarize(trace_dir, args.iters, args.top)


if __name__ == '__main__':
  main()
