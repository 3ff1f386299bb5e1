"""Random-policy benchmark CLI (reference: crafter/run_random.py:1-48).

Prints reset time, steps/s, and resource counts like the reference harness,
plus the batched-engine throughput that is this framework's reason to
exist (use --envs for the vectorized run).
"""

import argparse
import time

import numpy as np



def _apply_platform_env():
  from crafter_tpu.utils import apply_platform_env
  apply_platform_env()

def main():
  _apply_platform_env()
  parser = argparse.ArgumentParser()
  parser.add_argument('--seed', type=int, default=None)
  parser.add_argument('--area', nargs=2, type=int, default=(64, 64))
  parser.add_argument('--view', type=int, nargs=2, default=(9, 9))
  parser.add_argument('--length', type=int, default=10000)
  parser.add_argument('--health', type=int, default=9)
  parser.add_argument('--size', nargs=2, type=int, default=(64, 64))
  parser.add_argument('--steps', type=int, default=1000)
  parser.add_argument('--record', type=str, default=None,
                      help='record stats/video/episodes to this directory '
                           '(reference run_random.py:16,24)')
  parser.add_argument('--envs', type=int, default=0,
                      help='if >0, run the batched VecEnv instead')
  parser.add_argument('--profile', type=str, default=None,
                      help='write a jax.profiler trace to this directory')
  args = parser.parse_args()

  import crafter_tpu
  from crafter_tpu import rules

  if args.health != 9:  # run_random.py:21-22 health override
    rules.override_rules(lambda r: r['items']['health'].update(
        max=args.health, initial=args.health))

  if args.envs:
    from crafter_tpu.env import VecEnv
    env = VecEnv(args.envs, seed=args.seed or 0)
    start = time.time()
    env.reset()
    print(f'Batched reset time: {1e3 * (time.time() - start):.2f}ms '
          f'({args.envs} envs)')
    rng = np.random.default_rng(args.seed)
    import contextlib
    profiler = contextlib.nullcontext()
    if args.profile:
      from crafter_tpu.utils.profiling import trace
      profiler = trace(args.profile)
    start = time.time()
    steps = 0
    with profiler:
      while steps < args.steps:
        _, _, done, _ = env.step(rng.integers(0, 17, args.envs))
        steps += args.envs
    duration = time.time() - start
    print(f'Step time: {1e3 * duration / steps:.4f}ms ({int(steps/duration)} env-steps/s)')
    return

  env = crafter_tpu.Env(
      area=args.area, view=args.view, length=args.length, seed=args.seed,
      size=args.size)
  if args.record:
    from crafter_tpu.recorder import Recorder
    env = Recorder(env, args.record)
  start = time.time()
  env.reset()
  print(f'Reset time: {1e3 * (time.time() - start):.2f}ms')
  start = time.time()
  steps = 0
  done = False
  rng = np.random.default_rng(args.seed)
  while steps < args.steps:
    if done:
      env.reset()
      done = False
    _, _, done, info = env.step(rng.integers(0, 17))
    steps += 1
  duration = time.time() - start
  step_time = duration / steps
  print(f'Step time: {1e3 * step_time:.2f}ms ({int(1/step_time)} fps)')
  # Resource presence like run_random.py:40-43.
  semantic = info['semantic']
  from crafter_tpu import rules
  for name in ('coal', 'iron', 'diamond'):
    count = int((semantic == rules.MAT_ID[name]).sum())
    print(f'{name.title()} count: {count}')


if __name__ == '__main__':
  main()
