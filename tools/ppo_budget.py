"""Per-stage PPO budget: where does a 4096-env update's wall time go?

VERDICT r4: the PPO loop ran at 191k env-steps/s against a >=300k bar
with no stage table to aim the work — this tool produces that table
(PERF.md carries the latest copy).  Stages, each timed as its own jitted
program with host-copy barriers (PERF.md protocol):

  env_only   rollout_len env ticks (vec_step, no render, no model)
  env_render env ticks + a uint8 frame per tick (observe_batch)
  policy     rollout_len CNN forwards + action sampling on a fixed frame
  rollout    the real interleaved rollout (PPO._rollout)
  gae        the reverse scan alone
  learn      GAE + epochs x minibatch SGD + stat packing (PPO._learn)
  full       train_step end to end

    python tools/ppo_budget.py --num_envs 4096 --rollout 64
"""

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import json
import time


def timed(fn, barrier, reps=3):
  """Best-of-reps wall time of fn(); barrier(out) must force a host copy."""
  out = fn()
  barrier(out)  # compile + warmup
  best = float('inf')
  for _ in range(reps):
    t0 = time.perf_counter()
    out = fn()
    barrier(out)
    best = min(best, time.perf_counter() - t0)
  return best


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--num_envs', type=int, default=4096)
  parser.add_argument('--rollout', type=int, default=64)
  parser.add_argument('--minibatches', type=int, default=8)
  parser.add_argument('--epochs', type=int, default=3)
  parser.add_argument('--reps', type=int, default=3)
  args = parser.parse_args()

  from crafter_tpu.utils import apply_platform_env, enable_compile_cache
  apply_platform_env()
  enable_compile_cache()
  import jax
  import jax.numpy as jnp
  from crafter_tpu.config import EnvConfig
  from crafter_tpu.env import vec_step
  from crafter_tpu.ppo import PPO, PPOConfig

  env_cfg = EnvConfig()
  cfg = PPOConfig(num_envs=args.num_envs, rollout_len=args.rollout,
                  minibatches=args.minibatches, epochs=args.epochs,
                  reset_batch=max(32, args.num_envs // 128))
  ppo = PPO(env_cfg, cfg)
  ts = ppo.init(jax.random.key(0))
  float(ts.env_steps)

  t = {}
  n, T = args.num_envs, args.rollout
  k = env_cfg.balance_every
  grouped = T % k == 0 and T >= k

  # -- env-only and env+render scans (the rollout's env portion) ----------
  def env_scan(render):
    def body(carry, i):
      vec, key = carry
      key, ka = jax.random.split(key)
      a = jax.random.randint(ka, (n,), 0, 17)
      vec, out, _ = vec_step(
          vec, a, env_cfg, k * cfg.reset_batch if grouped else
          cfg.reset_batch, reset_every=k if grouped else 1,
          balance=None if not grouped else (i % k == k - 1))
      aggr = out.reward.sum()
      if render:
        obs = ppo.core.observe_batch(vec.env)
        aggr = aggr + obs[..., 0].astype(jnp.int32).sum()
      return (vec, key), aggr
    if grouped:
      # balance must be a static branch: unroll k ticks per scan step.
      def group(carry, _):
        aggrs = 0.
        for i in range(k):
          carry, aggr = body(carry, i)
          aggrs = aggrs + aggr
        return carry, aggrs
      f = jax.jit(lambda vec, key: jax.lax.scan(
          group, (vec, key), None, length=T // k)[1].sum())
    else:
      f = jax.jit(lambda vec, key: jax.lax.scan(
          body, (vec, key), jnp.arange(T))[1].sum())
    return f

  f_env = env_scan(render=False)
  t['env_only'] = timed(lambda: f_env(ts.vec, jax.random.key(1)), float,
                        args.reps)
  f_envr = env_scan(render=True)
  t['env_render'] = timed(lambda: f_envr(ts.vec, jax.random.key(1)), float,
                          args.reps)

  # -- policy forward + sampling on a fixed frame batch --------------------
  @jax.jit
  def f_policy(params, obs, key):
    def body(carry, _):
      key, s = carry
      key, ka = jax.random.split(key)
      out = ppo.model.apply(params, obs)
      a = jax.random.categorical(ka, out.logits)
      return (key, s + a.sum() + out.value.sum().astype(jnp.int32)), None
    return jax.lax.scan(body, (key, jnp.int32(0)), None, length=T)[0][1]

  t['policy'] = timed(
      lambda: f_policy(ts.params, ts.obs, jax.random.key(2)), float,
      args.reps)

  # -- the real rollout, GAE, learn, full ----------------------------------
  f_roll = jax.jit(ppo._rollout)
  roll = f_roll(ts)
  float(roll[2].sum())
  t['rollout'] = timed(lambda: f_roll(ts),
                       lambda o: float(o[2].sum()), args.reps)
  _, traj, last_value = roll

  f_gae = jax.jit(ppo._gae)
  t['gae'] = timed(lambda: f_gae(traj, last_value),
                   lambda o: float(o[0].sum()), args.reps)

  f_learn = jax.jit(ppo._learn)
  t['learn'] = timed(lambda: f_learn(ts, traj, last_value),
                     lambda o: float(o[1]['loss']), args.reps)

  f_full = jax.jit(ppo.train_step)
  t['full'] = timed(lambda: f_full(ts),
                    lambda o: float(o[1]['loss']), args.reps)

  steps = n * T
  print(f'{"stage":<12} {"ms":>9} {"steps/s":>12}  note')
  rows = [
      ('env_only', 'vec_step x T, no render'),
      ('env_render', 'env_only + uint8 frame per tick'),
      ('policy', 'CNN forward + sample x T (fixed frame)'),
      ('rollout', 'real interleave (env+render+policy)'),
      ('gae', 'reverse scan'),
      ('learn', 'GAE + SGD epochs + stat pack'),
      ('full', 'train_step'),
  ]
  for name, note in rows:
    ms = t[name] * 1000
    print(f'{name:<12} {ms:9.1f} {steps / t[name]:12,.0f}  {note}')
  print(f'render share: {(t["env_render"] - t["env_only"]) * 1000:.1f} ms; '
        f'rollout overhead vs env_render+policy: '
        f'{(t["rollout"] - t["env_render"] - t["policy"]) * 1000:.1f} ms; '
        f'full-vs-rollout+learn gap: '
        f'{(t["full"] - t["rollout"] - t["learn"]) * 1000:.1f} ms')
  print(json.dumps({'num_envs': n, 'rollout_len': T,
                    **{k2: round(v * 1000, 1) for k2, v in t.items()},
                    'full_steps_per_s': round(steps / t['full'])}))


if __name__ == '__main__':
  main()
