"""PPO training CLI: the reference's examples/run_ppo.py, TPU-native.

Trains the CNN policy on the device-resident env batch and records
`stats.jsonl` (via VecStatsRecorder) so the analysis pipeline scores the
run exactly like any reference logdir:

    python -m crafter_tpu.run_train --steps 1000000 --outdir logdir/ppo/0
    python -c "from crafter_tpu import analysis; \
        print(analysis.read_stats('logdir/ppo', 'scores', 'crafter_reward', 'ppo'))"

Checkpoints (params + opt state + env batch — the env state is a pytree,
so training resumes mid-episode bit-exactly) go to --outdir via orbax.
"""

import argparse
import pathlib
import time



def _apply_platform_env():
  from crafter_tpu.utils import apply_platform_env
  apply_platform_env()

def main():
  _apply_platform_env()
  parser = argparse.ArgumentParser()
  parser.add_argument('--outdir', type=str, default='logdir/ppo')
  parser.add_argument('--steps', type=int, default=1_000_000)
  parser.add_argument('--num_envs', type=int, default=64)
  parser.add_argument('--rollout', type=int, default=64)
  parser.add_argument('--lr', type=float, default=3e-4)
  parser.add_argument('--ent_coef', type=float, default=0.01)
  parser.add_argument('--seed', type=int, default=0)
  parser.add_argument('--ckpt_every', type=int, default=50)
  parser.add_argument('--log_every', type=int, default=5)
  parser.add_argument('--resume', action='store_true')
  args = parser.parse_args()

  import jax
  import numpy as np
  from crafter_tpu import analysis, rules
  from crafter_tpu.config import EnvConfig
  from crafter_tpu.env import vec_step
  from crafter_tpu.ppo import PPO, PPOConfig
  from crafter_tpu.recorder import VecStatsRecorder
  from crafter_tpu import checkpoint as ckpt_lib

  outdir = pathlib.Path(args.outdir)
  outdir.mkdir(parents=True, exist_ok=True)
  env_cfg = EnvConfig()
  cfg = PPOConfig(num_envs=args.num_envs, rollout_len=args.rollout,
                  lr=args.lr, ent_coef=args.ent_coef, seed=args.seed,
                  reset_batch=min(64, args.num_envs))
  ppo = PPO(env_cfg, cfg)
  ts = ppo.init(jax.random.key(args.seed))
  ckpt = ckpt_lib.Checkpointer(outdir / 'ckpt')
  if args.resume:
    ts = ckpt.restore_latest(ts) or ts

  recorder = VecStatsRecorder(args.num_envs, outdir)
  train_step = jax.jit(ppo.train_step_with_stats)

  steps_per_update = cfg.num_envs * cfg.rollout_len
  last = time.time()
  dropped = 0
  while int(ts.env_steps) < args.steps:
    ts, metrics, stats = train_step(ts)
    # Episode bookkeeping: finished episodes accumulate on device
    # (ppo.PPO._episode_stats); the host drains the packed buffer once
    # per update — no per-step per-env Python loop.
    count, lens, rets, achs, drop = jax.device_get(
        (stats['count'], stats['lengths'], stats['returns'],
         stats['achievements'], stats['dropped']))
    recorder.add_episodes(count, lens, rets, achs)
    dropped += int(drop)
    if drop:
      print(f'WARNING: episode buffer overflow, {int(drop)} episodes '
            f'dropped this update ({dropped} total)', flush=True)
    if int(ts.update) % args.log_every == 0:
      sps = args.log_every * steps_per_update / (time.time() - last)
      last = time.time()
      print(f'update {int(ts.update)} steps {int(ts.env_steps)} '
            f'loss {float(metrics["loss"]):.4f} '
            f'entropy {float(metrics["entropy"]):.3f} '
            f'reward/step {float(metrics["reward_per_step"]):.4f} '
            f'episodes {int(metrics["episodes_done"])} '
            f'({sps:,.0f} steps/s)', flush=True)
    if int(ts.update) % args.ckpt_every == 0:
      ckpt.save(int(ts.update), ts)
  ckpt.save(int(ts.update), ts)
  print('Training done:', int(ts.env_steps), 'env steps')


if __name__ == '__main__':
  main()
