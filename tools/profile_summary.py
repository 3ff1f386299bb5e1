"""Capture a device trace of the engine loop and print per-op timings.

Wraps `jax.profiler` (crafter_tpu/utils/profiling.py) with an hlo_stats
summary so a perf session is one command:

    python tools/profile_summary.py --num_envs 4096 --iters 20
    python tools/profile_summary.py --trace /tmp/existing_trace  # reparse

Prints the top self-time HLO ops per loop iteration with source
attribution — the view that located every round-2 bottleneck (the fused
kernel share, worldgen noise, layout copies; see PERF.md).
"""

import pathlib as _pathlib
import sys as _sys

# Runnable as a plain script: put the repo root on sys.path so
# crafter_tpu imports without an installed package.
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import glob
import json


def capture(num_envs: int, iters: int, trace_dir: str,
            group: bool = False, render: bool = False) -> int:
  """Runs the traced loop; returns the number of ticks actually executed
  (iters rounded down to whole balance-cadence groups), which summarize()
  must use as the per-iteration normalizer."""
  from crafter_tpu.utils import apply_platform_env, enable_compile_cache
  apply_platform_env()
  enable_compile_cache()
  import jax
  import jax.numpy as jnp
  from crafter_tpu.config import EnvConfig
  from crafter_tpu.env import (CrafterEnv, home_keys, vec_reset_chunked,
                               vec_step, vec_step_group, vec_step_group_obs)

  cfg = EnvConfig(reward=False)
  core = CrafterEnv(cfg) if render else None
  n = num_envs
  vs = vec_reset_chunked(home_keys(0, n), cfg, chunk=min(n, 4096))
  rb = max(32, n // 128)

  # Mirror bench.py's loop: one balance-cadence group per scan iteration,
  # balance as a static branch on the group's last tick (``--group``: the
  # whole group as one fused kernel, bench.py's state-only path).
  kk = cfg.balance_every

  groups = max(iters // kk, 1)

  @jax.jit
  def loop(v, key):
    def body(carry, _):
      v, key = carry
      key, k = jax.random.split(key)
      a = jax.random.randint(k, (kk, n), 0, 17)
      if render:
        v, outs, obs = vec_step_group_obs(v, a, cfg, min(n, kk * rb), core)
        return (v, key), (outs.done.sum()
                          + obs[..., 0, 0, 0].astype(jnp.int32).sum())
      aggr = jnp.int32(0)
      if group:
        v, _outs = vec_step_group(v, a, cfg, min(n, kk * rb))
      else:
        for i in range(kk):
          v, out, _ = vec_step(v, a[i], cfg, rb, balance=(i == kk - 1))
      return (v, key), aggr
    (v, key), aggr = jax.lax.scan(body, (v, key), None, length=groups)
    return v, aggr.sum()

  key = jax.random.key(0)
  v, aggr = loop(vs, key)
  # Host copies: the only reliable barrier (PERF.md); aggr also keeps the
  # render path alive against DCE.
  v.env.step.sum().item(); aggr.item()
  jax.profiler.start_trace(trace_dir)
  v, aggr = loop(v, key)
  v.env.step.sum().item(); aggr.item()
  jax.profiler.stop_trace()
  return groups * kk


def summarize(trace_dir: str, iters: int, top: int) -> None:
  files = glob.glob(f'{trace_dir}/plugins/profile/*/*.xplane.pb')
  if not files:
    print(f'no xplane.pb under {trace_dir}')
    return
  from xprof.convert import raw_to_tool_data as r2t
  data, _ = r2t.xspace_to_tool_data([max(files)], 'hlo_stats', {})
  d = json.loads(data) if isinstance(data, (str, bytes)) else data
  cols = [c['label'] for c in d['cols']]
  recs = [[c.get('v') for c in r['c']] for r in d['rows']]
  i_name = cols.index('HLO op name')
  i_cat = cols.index('HLO op category')
  i_self = cols.index('Total self time (us)')
  i_occ = cols.index('#Occurrences')
  i_src = cols.index('Source Info')
  recs.sort(key=lambda r: -(r[i_self] or 0))
  total = sum(r[i_self] or 0 for r in recs)
  print(f'{"ms/iter":>8} {"x":>4} {"category":<16} {"op":<28} source')
  for r in recs[:top]:
    src = (r[i_src] or '').split("title=''>")[-1].split('<')[0]
    print(f'{(r[i_self] or 0) / iters / 1000:8.3f} {int(r[i_occ] or 0):4d} '
          f'{(r[i_cat] or "")[:16]:<16} {(r[i_name] or "")[:28]:<28} '
          f'{src[:44]}')
  print(f'total self time: {total / iters / 1000:.2f} ms/iter')


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--num_envs', type=int, default=4096)
  parser.add_argument('--iters', type=int, default=20)
  parser.add_argument('--trace', type=str, default=None,
                      help='reparse an existing trace dir instead of running')
  parser.add_argument('--top', type=int, default=20)
  parser.add_argument('--group', action='store_true',
                      help='profile the fused group-kernel path')
  parser.add_argument('--render', action='store_true',
                      help='profile the fused pixel path (group + frames)')
  args = parser.parse_args()
  trace_dir = args.trace or '/tmp/crafter_trace'
  ticks = args.iters
  if not args.trace:
    ticks = capture(args.num_envs, args.iters, trace_dir, args.group,
                    args.render)
  summarize(trace_dir, ticks, args.top)


if __name__ == '__main__':
  main()
