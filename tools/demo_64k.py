"""North-star config 4 demo: huge env batches sharded over a device mesh.

Runs the production engine at scale — the fused balance-cadence group
step over a 1-D 'dp' mesh, stats all-reduced with a `psum` — and prints
one JSON line per batch size with throughput.  On one chip the mesh has
one device; on a pod slice the same script spans all chips via
`crafter_tpu.parallel.mesh.make_sharded_group_step` (per-shard Mosaic
kernels under shard_map — GSPMD cannot split an opaque pallas_call) and,
with `jax.distributed` initialized through `distributed_init`, all hosts
(tests/test_distributed.py has the multi-process wiring).

    python tools/demo_64k.py --num_envs 32768 --steps 400
    python tools/demo_64k.py --sweep 4096,8192,16384,32768 --steps 400

Multi-host recipe (N hosts, e.g. a v5e-64 slice, 8 hosts x 8 chips):

    # on every host (process_id 0..N-1):
    python tools/demo_64k.py --num_envs 65536 --steps 400 \
        --coordinator host0:8476 --num_processes N --process_id $ID

Each host generates only its local shard of worlds (reset is chunked and
sharded), steps only its local rows, and the `psum_stats` line is the
only cross-host traffic.
"""

import pathlib as _pathlib
import sys as _sys

# Runnable as a plain script: put the repo root on sys.path so
# crafter_tpu imports without an installed package.
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import json
import time


def run_size(n, steps, cfg, mesh):
  import jax
  import jax.numpy as jnp
  from crafter_tpu.env import home_keys, vec_reset, vec_step_group
  from crafter_tpu.parallel.mesh import make_sharded_group_step, psum_stats

  from jax.sharding import NamedSharding, PartitionSpec as P

  kk = cfg.balance_every
  groups = max(steps // kk, 1)
  # Group-sized reset pass: deaths per group are ~kk*n/170 under a random
  # policy; the round-3 demo ran per-tick passes of n/128 fresh worldgens
  # EVERY tick, which collapsed 32k-env throughput to 394k steps/s.
  reset_batch = min(n, kk * max(32, n // 128))
  dp = NamedSharding(mesh, P('dp'))
  rep = NamedSharding(mesh, P())

  if jax.process_count() > 1:
    # Establish the cross-process collective context with a trivial psum
    # BEFORE any heavy compile: Gloo context initialization only waits
    # ~30 s for all processes to rendezvous, and compile skew between
    # processes (e.g. under CI load) can exceed that if the first
    # collective dispatch is also the biggest program.
    psum_stats({'warmup': jnp.float32(1.0)}, mesh)

  def dp_shardings(fn, rows):
    shapes = jax.eval_shape(fn)
    return jax.tree.map(
        lambda sh: dp if (sh.ndim >= 1 and sh.shape[0] == rows) else rep,
        shapes)

  # Sharded chunked reset: each device generates only its own rows, and
  # every array is built INSIDE jit with sharded out_shardings — on a
  # multi-process mesh host arrays cannot be device_put to a global
  # sharding, so the SPMD computation is the only portable constructor.
  chunk = min(n, max(4096, 512 * len(jax.devices())))
  pieces = []
  for i in range(0, n, chunk):
    rows = min(chunk, n - i)
    fn = lambda i=i, r=rows: vec_reset(home_keys(0, n)[i:i + r], cfg)
    pieces.append(jax.jit(fn, out_shardings=dp_shardings(fn, rows))())
  cat = lambda *xs: xs[0] if xs[0].ndim == 0 else jnp.concatenate(xs)
  fn_cat = lambda: jax.tree.map(cat, *pieces)
  vs = (jax.jit(fn_cat, out_shardings=dp_shardings(fn_cat, n))()
        if len(pieces) > 1 else pieces[0])
  jax.block_until_ready(vs)

  if mesh.devices.size > 1:
    gstep = make_sharded_group_step(mesh, cfg, reset_batch)
  else:
    gstep = jax.jit(
        lambda v, a: vec_step_group(v, a, cfg, reset_batch))

  @jax.jit
  def loop(vs, seed):
    key = jax.random.key(seed)  # built in-graph: replicated on every host
    def body(carry, _):
      vs, key = carry
      key, k_act = jax.random.split(key)
      actions = jax.random.randint(k_act, (kk, n), 0, 17)
      vs, outs = gstep(vs, actions)
      # `ended` pulses once per finished episode (no latched re-counts).
      return (vs, key), jnp.stack(
          [outs.ended.sum().astype(jnp.float32), outs.reward.sum()])
    (vs, key), aggr = jax.lax.scan(body, (vs, key), None, length=groups)
    return vs, aggr.sum(0)

  vs1, aggr = loop(vs, 0)            # compile + warmup
  float(aggr[0])  # host copy: the only reliable completion barrier
                  # through a remote-device tunnel (see PERF.md)
  t0 = time.perf_counter()
  vs2, aggr = loop(vs1, 1)
  done_total = float(aggr[0])        # host copy = completion barrier
  dt = time.perf_counter() - t0
  # Advancement check (PERF.md protocol): every env stepped or reset.
  stepped = (vs2.env.step - vs1.env.step) == groups * kk
  reset_ok = vs2.episode > vs1.episode
  assert bool(jnp.all(stepped | reset_ok)), 'envs neither stepped nor reset'

  # Cross-host stats reduction (a no-op sum on one process, a DCN/ICI
  # psum on many) — the config-4 "stats allreduce".
  stats = psum_stats({'episodes_done': jnp.float32(done_total),
                      'env_steps': jnp.float32(n * groups * kk)}, mesh)
  import jax as _jax
  print(json.dumps(dict(
      metric='env_steps_per_s', value=round(n * groups * kk / dt),
      per_env=round(groups * kk / dt, 1),
      num_envs=n, steps=groups * kk, devices=len(_jax.devices()),
      processes=_jax.process_count(),
      episodes_done=int(stats['episodes_done']),
      wall_s=round(dt, 2))), flush=True)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--num_envs', type=int, default=65536)
  parser.add_argument('--sweep', type=str, default=None,
                      help='comma-separated batch sizes to sweep')
  parser.add_argument('--steps', type=int, default=400)
  parser.add_argument('--coordinator', type=str, default=None)
  parser.add_argument('--num_processes', type=int, default=None)
  parser.add_argument('--process_id', type=int, default=None)
  args = parser.parse_args()

  from crafter_tpu.utils import apply_platform_env, enable_compile_cache
  apply_platform_env()
  enable_compile_cache()
  from crafter_tpu.config import EnvConfig
  from crafter_tpu.parallel.mesh import distributed_init, dp_mesh

  if args.coordinator:
    distributed_init(args.coordinator, args.num_processes, args.process_id)

  cfg = EnvConfig(reward=False)
  mesh = dp_mesh()
  sizes = ([int(s) for s in args.sweep.split(',')] if args.sweep
           else [args.num_envs])
  for n in sizes:
    run_size(n, args.steps, cfg, mesh)


if __name__ == '__main__':
  main()
