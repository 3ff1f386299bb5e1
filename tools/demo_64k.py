"""North-star config 4 demo: 64k envs sharded over a device mesh.

Runs the production sharded path at scale — `vec_reset` / `vec_step` with
the env batch laid out over a 1-D 'dp' mesh (`NamedSharding`), stats
all-reduced with a `psum` over the mesh — and prints one JSON line with
throughput.  On this sandbox's single TPU chip the mesh has one device;
on a pod slice the same script spans all chips (and, with
`jax.distributed` initialized via `crafter_tpu.parallel.mesh.
distributed_init`, all hosts — see tests/test_distributed.py for the
multi-process wiring, which this script reuses unchanged).

    python tools/demo_64k.py --num_envs 65536 --steps 200

Multi-host recipe (N hosts, e.g. a v5e-64 slice, 8 hosts x 8 chips):

    # on every host (process_id 0..N-1):
    python tools/demo_64k.py --num_envs 65536 --steps 200 \
        --coordinator host0:8476 --num_processes N --process_id $ID

Each host generates only its local shard of worlds (vec_reset is jitted
with sharded output, so worldgen runs where the rows live), steps only its
local rows, and the `psum_stats` line is the only cross-host traffic.
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
  parser.add_argument('--num_envs', type=int, default=65536)
  parser.add_argument('--steps', type=int, default=200)
  parser.add_argument('--coordinator', type=str, default=None)
  parser.add_argument('--num_processes', type=int, default=None)
  parser.add_argument('--process_id', type=int, default=None)
  args = parser.parse_args()

  from crafter_tpu.utils import apply_platform_env, enable_compile_cache
  apply_platform_env()
  enable_compile_cache()
  import jax
  import jax.numpy as jnp
  from jax.sharding import NamedSharding, PartitionSpec as P
  from crafter_tpu.config import EnvConfig
  from crafter_tpu.env import home_keys, vec_reset, vec_step
  from crafter_tpu.parallel.mesh import (distributed_init, dp_mesh,
                                         psum_stats)

  if args.coordinator:
    distributed_init(args.coordinator, args.num_processes, args.process_id)

  n = args.num_envs
  cfg = EnvConfig(reward=False)
  mesh = dp_mesh()
  dp = NamedSharding(mesh, P('dp'))
  rep = NamedSharding(mesh, P())
  reset_batch = max(32, n // 128)

  # Sharded chunked reset: the env-batch sharding of the input keys
  # propagates through worldgen, so each device generates only its own
  # rows (no host-side world blob).  Chunking bounds worldgen's
  # intermediates — a one-shot 64k fused worldgen peaks >20 GB of HBM
  # while the steady-state env batch itself is ~21 KB/env.
  keys = jax.device_put(home_keys(0, n), dp)
  reset = jax.jit(vec_reset, static_argnums=1)
  chunk = max(4096, 512 * len(jax.devices()))
  pieces = [reset(keys[i:i + chunk], cfg) for i in range(0, n, chunk)]
  vs = jax.jit(
      lambda ps: jax.tree.map(
          lambda *xs: xs[0] if xs[0].ndim == 0 else jnp.concatenate(xs),
          *ps))(pieces)
  vs = jax.tree.map(
      lambda x: jax.device_put(x, rep if x.ndim == 0 else dp), vs)
  jax.block_until_ready(vs)

  @jax.jit
  def loop(vs, key):
    def body(carry, _):
      vs, key, prev_done = carry
      key, k_act = jax.random.split(key)
      actions = jax.random.randint(k_act, (n,), 0, 17)
      vs, out, _ = vec_step(vs, actions, cfg, reset_batch)
      # done latches until the env wins a reset slot; count each episode
      # once, at its first terminal step.
      fresh = (out.done & ~prev_done).sum()
      return (vs, key, out.done), jnp.stack([fresh, out.reward.sum()])
    (vs, key, _), aggr = jax.lax.scan(
        body, (vs, key, jnp.zeros((n,), bool)), None, length=args.steps)
    return vs, aggr.sum(0)

  key = jax.device_put(jax.random.key(0), rep)
  vs, aggr = loop(vs, key)          # compile + warmup
  float(aggr[0])  # host copy: the only reliable completion barrier
                  # through a remote-device tunnel (see PERF.md)
  t0 = time.perf_counter()
  vs, aggr = loop(vs, key)
  done_total = float(aggr[0])       # host copy = completion barrier
  dt = time.perf_counter() - t0

  # Cross-host stats reduction (a no-op sum on one process, a DCN/ICI
  # psum on many) — the config-4 "stats allreduce".
  stats = psum_stats({'episodes_done': jnp.float32(done_total),
                      'env_steps': jnp.float32(n * args.steps)}, mesh)

  print(json.dumps(dict(
      metric='env_steps_per_s_64k', value=round(n * args.steps / dt),
      num_envs=n, steps=args.steps, devices=len(jax.devices()),
      processes=jax.process_count(),
      episodes_done=int(stats['episodes_done']),
      wall_s=round(dt, 2))), flush=True)


if __name__ == '__main__':
  main()
