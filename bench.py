"""Benchmark: env-steps/s of the batched engine on the local accelerator.

Prints ONE JSON line: env-steps/s for the state-only NoReward engine loop
(BASELINE.json config 2) at the largest batch size that runs cleanly
(preferring 4096), with the full pixel pipeline (config 3) reported on
stderr.  ``vs_baseline`` is measured throughput over the north-star target
of 1M env-steps/s/chip (the reference publishes no throughput; its harness
is crafter/run_random.py:28-43).

The loop includes everything a training run pays: action sampling, the
simulation tick, chunk balancing, and partial-batch auto-reset worldgen.

Robustness: this sandbox reaches its TPU through a tunnel whose device
contexts fault stochastically (and a fault poisons the whole process), so
each measurement runs in a subprocess (`--single`), the orchestrator
retries with recovery pauses, timing is scan-based (one dispatch per
measurement — the tunnel adds ~1s per dispatch), and every measurement is
validated by checking that env step counters actually advanced.
"""

import json
import os
import subprocess
import sys
import time

CACHE_DIR = '/tmp/jax_compile_cache'


def _setup_jax():
  import jax
  try:
    jax.config.update('jax_compilation_cache_dir', CACHE_DIR)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
  except Exception:
    pass
  return jax


def bench_engine(num_envs, scan_len, repeats=3, render=False,
                 reset_batch=None):
  jax = _setup_jax()
  import jax.numpy as jnp
  from crafter_tpu.config import EnvConfig
  from crafter_tpu.env import (CrafterEnv, home_keys, vec_reset_chunked,
                               vec_step_group, vec_step_group_obs)

  cfg = EnvConfig(reward=False)
  core = CrafterEnv(cfg) if render else None
  kk = cfg.balance_every
  if reset_batch is None:
    # The VecEnv default sizing heuristic, scaled to the group path's
    # K-tick reset cadence (~K*N/170 episodes finish per reset pass under
    # a random policy; an undersized batch silently floods the pending
    # queue — most envs then step as junk while waiting — so the honest
    # bench uses the same sizing the product does).
    per_tick = min(num_envs, max(32, num_envs // 128))
    reset_batch = min(num_envs, kk * per_tick)

  # Round to a whole number of cadence groups (a hard assert would reject
  # user-supplied lengths, e.g. orchestrate's scan_len//4 pixel pass).
  scan_len = max(kk, scan_len // kk * kk)

  @jax.jit
  def loop(vs, key):
    def body(carry, _):
      vs, key = carry
      key, k_act = jax.random.split(key)
      actions = jax.random.randint(k_act, (kk, num_envs), 0, 17)
      if render:
        # Pixel config: the group kernel emits per-tick render snapshots
        # from VMEM and all K frames render in one batched pass
        # (env.py:vec_step_group_obs) — a frame EVERY tick, like the
        # reference's obs-per-step (crafter/env.py:96).  Folding real
        # pixel values into the aggregate keeps XLA from dead-coding the
        # render.
        vs, outs, obs = vec_step_group_obs(vs, actions, cfg, reset_batch,
                                           core)
        aggr = outs.done.sum() + obs[..., 0, 0, 0].astype(jnp.int32).sum()
      else:
        # State-only config: one whole balance-cadence group per fused
        # kernel launch (vec_step_group) — the product path for headless
        # rollouts; bit-identical to K vec_step(reset_every=K) ticks.
        vs, outs = vec_step_group(vs, actions, cfg, reset_batch)
        aggr = outs.done.sum()
      return (vs, key), aggr
    (vs, key), dones = jax.lax.scan(body, (vs, key), None,
                                    length=scan_len // kk)
    return vs, dones.sum()

  vs = vec_reset_chunked(home_keys(0, num_envs), cfg)
  float(vs.env.step.sum())          # host copy: the only reliable sync
  vs, d0 = loop(vs, jax.random.key(0))  # compile + warmup
  float(d0)

  best = 0.0
  for r in range(repeats):
    t0 = time.perf_counter()
    vs2, dones = loop(vs, jax.random.key(r + 1))
    float(dones)  # block_until_ready returns early through the TPU tunnel;
    #               a host copy is the only trustworthy completion barrier
    dt = time.perf_counter() - t0
    # Distrust a wedged device: every env must either have advanced by the
    # full scan or have auto-reset into a new episode (which rewinds its
    # step counter — episode counters are monotonic).
    stepped = (vs2.env.step - vs.env.step) == scan_len
    reset = vs2.episode > vs.episode
    if not bool(jnp.all(stepped | reset)):
      bad = int(jnp.sum(~(stepped | reset)))
      raise RuntimeError(f'{bad} envs neither stepped nor reset')
    best = max(best, num_envs * scan_len / dt)
    vs = vs2
  return best


def single(num_envs, scan_len, render):
  sps = bench_engine(num_envs, scan_len, render=render)
  print(json.dumps({'ok': True, 'sps': sps}))


def orchestrate(sizes, scan_len, budget_s=3000):
  deadline = time.time() + budget_s
  env = dict(os.environ)

  def attempt(n, t, render):
    try:
      out = subprocess.run(
          [sys.executable, __file__, '--single', str(n), str(t),
           str(int(render))],
          capture_output=True, text=True, timeout=900, env=env)
      for line in out.stdout.splitlines():
        try:
          rec = json.loads(line)
          if rec.get('ok'):
            return rec['sps']
        except json.JSONDecodeError:
          continue
      err = (out.stderr or '').strip().splitlines()
      print(f'attempt N={n} failed: {err[-1] if err else "no output"}',
            file=sys.stderr)
    except subprocess.TimeoutExpired:
      print(f'attempt N={n} timed out', file=sys.stderr)
    return None

  state_sps, used = None, None
  for n in sizes:
    for retry in range(2):
      if time.time() > deadline:
        break
      sps = attempt(n, scan_len, render=False)
      if sps:
        state_sps, used = sps, n
        break
      time.sleep(60 * (retry + 1))  # let a faulted tunnel recover
    if state_sps:
      break

  if state_sps is None:
    print(json.dumps({'metric': 'env-steps/s (bench failed)', 'value': 0,
                      'unit': 'env-steps/s', 'vs_baseline': 0}))
    return
  print(f'envs={used} state-only={state_sps:,.0f} steps/s', file=sys.stderr)
  pixel = None
  if time.time() < deadline:
    pixel = attempt(used, max(scan_len // 2, 10), render=True)
    if pixel:
      print(f'pixel={pixel:,.0f} steps/s', file=sys.stderr)
  rec = {
      'metric': f'env-steps/s @ {used} envs (state-only engine loop)',
      'value': round(state_sps),
      'unit': 'env-steps/s',
      'vs_baseline': round(state_sps / 1_000_000, 4),
  }
  if pixel:
    # BASELINE config 3 (full pixel pipeline: a frame rendered every
    # tick), tracked in the parsed record rather than stderr-only.
    rec['pixel_value'] = round(pixel)
    rec['pixel_vs_baseline'] = round(pixel / 1_000_000, 4)
  print(json.dumps(rec))


def main():
  if len(sys.argv) > 1 and sys.argv[1] == '--single':
    single(int(sys.argv[2]), int(sys.argv[3]), bool(int(sys.argv[4])))
    return
  sizes = [int(sys.argv[1])] if len(sys.argv) > 1 else [4096, 2048, 1024]
  # The tunnel charges ~60ms per jit *call* regardless of scan length (an
  # empty scan costs the same); production rollouts are long-lived loops,
  # so measure with a scan long enough to amortize the per-call constant
  # to <0.2ms/step.
  scan_len = int(sys.argv[2]) if len(sys.argv) > 2 else 400
  orchestrate(sizes, scan_len)


if __name__ == '__main__':
  main()
