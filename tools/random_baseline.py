"""Random-policy baseline: 1M env steps -> stats.jsonl -> Crafter score.

Reproduces the reference's published random baseline (1.6 +- 0.0,
reference README.md:147) end to end on the batched engine: random actions
over a VecEnv-style vec_step loop, per-episode stats in the reference's
stats.jsonl format, scored by the same geometric-mean pipeline
(analysis/common.py:47-55 formulas).

    python tools/random_baseline.py --steps 1000000 --envs 512 \
        --outdir logdir/random
"""

import pathlib as _pathlib
import sys as _sys

# Runnable as a plain script: put the repo root on sys.path so
# crafter_tpu imports without an installed package.
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import time


def multi(argv):
  """--seeds N: run N independent 1M-step baselines (one subprocess per
  seed — a wedged TPU tunnel then poisons one run, not all) and report
  mean ± std vs the reference's golden recompute (VERDICT r4 item 3)."""
  import json
  import re
  import subprocess
  import sys
  n_seeds = int(argv[argv.index('--seeds') + 1])
  steps = (int(argv[argv.index('--steps') + 1])
           if '--steps' in argv else 1_000_000)
  envs = int(argv[argv.index('--envs') + 1]) if '--envs' in argv else 512
  scores = []
  for seed in range(n_seeds):
    out = subprocess.run(
        [sys.executable, __file__, '--steps', str(steps), '--envs',
         str(envs), '--seed', str(seed), '--outdir',
         f'logdir/random_ci/{seed}'],
        capture_output=True, text=True, timeout=1800)
    m = re.search(r'random: crafter score ([0-9.]+)', out.stdout)
    if not m:
      print(f'seed {seed} FAILED:\n{out.stdout}\n{out.stderr}',
            file=sys.stderr)
      continue
    scores.append(float(m.group(1)))
    print(f'seed {seed}: {scores[-1]:.3f}', flush=True)
  import numpy as np
  arr = np.array(scores)
  print(json.dumps(dict(
      metric='random_crafter_score', seeds=len(arr),
      mean=round(float(arr.mean()), 3),
      std=round(float(arr.std(ddof=1)), 3) if len(arr) > 1 else 0.0,
      values=[round(v, 3) for v in arr.tolist()],
      golden_recompute=1.55)))


def main():
  import sys
  if '--seeds' in sys.argv:
    multi(sys.argv)
    return
  parser = argparse.ArgumentParser()
  parser.add_argument('--steps', type=int, default=1_000_000)
  parser.add_argument('--envs', type=int, default=512)
  parser.add_argument('--seed', type=int, default=0)
  parser.add_argument('--outdir', type=str, default='logdir/random')
  args = parser.parse_args()

  from crafter_tpu.utils import apply_platform_env, enable_compile_cache
  apply_platform_env()
  enable_compile_cache()
  import jax
  import jax.numpy as jnp
  import numpy as np
  from crafter_tpu import analysis
  from crafter_tpu.config import EnvConfig
  from crafter_tpu.env import home_keys, vec_reset_chunked, vec_step
  from crafter_tpu.recorder import VecStatsRecorder

  n = args.envs
  cfg = EnvConfig(reward=False)
  rb = max(32, n // 128)
  vs = vec_reset_chunked(home_keys(args.seed, n), cfg)
  rec = VecStatsRecorder(n, args.outdir)

  # One device dispatch per K ticks: through a remote-device tunnel each
  # host pull costs tens of ms, so draining per step serializes everything.
  K = 64

  @jax.jit
  def chunk(vs, key):
    def body(carry, _):
      vs, key = carry
      key, k = jax.random.split(key)
      a = jax.random.randint(k, (n,), 0, 17)
      vs, out, stepped = vec_step(vs, a, cfg, rb)
      return (vs, key), (out.reward, out.done, out.ended,
                         stepped.player.achievements)
    (vs, key), stats = jax.lax.scan(body, (vs, key), None, length=K)
    return vs, key, stats

  key = jax.random.key(args.seed)
  t0 = time.time()
  steps = 0
  # Overshoot the budget by ~10%: the score pipeline only counts episodes
  # that *completed* within the logged steps (read_metrics.py:45-64
  # semantics), and the last episodes are still in flight at the cutoff.
  target = args.steps + args.steps // 8
  while steps < target:
    vs, key, (rew, done, ended, ach) = chunk(vs, key)
    rew, done, ended, ach = (np.asarray(x) for x in (rew, done, ended, ach))
    for t in range(K):
      rec.add(rew[t], done[t], ach[t], ended=ended[t])
    steps += n * K
  dt = time.time() - t0
  print(f'{steps} env steps in {dt:.1f}s ({steps / dt:,.0f} steps/s)')

  out = analysis.read_stats(args.outdir, 'scores', 'crafter_noreward',
                            'random', args.steps)
  if out is None:
    print('no complete episodes within budget')
    return
  mean, std = analysis.crafter_score([out], args.steps)
  print(f'random: crafter score {float(mean[0]):.2f} '
        f'± {float(std[0]):.2f} % ({out})')


if __name__ == '__main__':
  main()
