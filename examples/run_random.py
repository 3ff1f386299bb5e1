"""1M-step random agent with full recording (reference:
examples/run_random.py:1-29) — but batched: the episode budget that takes
the reference hours of single-env stepping is a single VecEnv loop."""

import numpy as np

import crafter_tpu
from crafter_tpu.env import VecEnv
from crafter_tpu.recorder import VecStatsRecorder


def main(steps=1_000_000, num_envs=256, outdir='logdir/random'):
  env = VecEnv(num_envs, seed=0)
  recorder = VecStatsRecorder(num_envs, outdir)
  env.reset()
  rng = np.random.default_rng(0)
  done_steps = 0
  while done_steps < steps:
    actions = rng.integers(0, 17, num_envs)
    _, reward, done, info = env.step(actions)
    recorder.add(np.asarray(info['reward']), np.asarray(done),
                 np.asarray(info['achievements']),
                 ended=np.asarray(info['ended']))
    done_steps += num_envs
  print('Recorded', done_steps, 'steps to', outdir)


if __name__ == '__main__':
  main()
