"""One process of a multi-process `jax.distributed` CPU test cluster.

Launched by tests/test_distributed.py (and usable manually):

    python tools/dist_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices (``--xla_force_host_platform_
device_count``); together they form the global mesh SURVEY.md §4(d)
prescribes as the stand-in for a real pod slice.  The worker exercises the
REAL multi-host code path: `jax.distributed.initialize` via
crafter_tpu.parallel.mesh.distributed_init, a global `Mesh` spanning both
processes' devices, sharded `vec_reset`/`vec_step` (the same entry points
production uses), and a cross-process stats psum.
"""

import os
import pathlib
import sys

# Launched as a script (`python tools/dist_worker.py`), so sys.path[0] is
# tools/ — make the repo root importable without requiring an installed
# crafter_tpu package.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')


def main():
  process_id, num_processes, port = (int(sys.argv[1]), int(sys.argv[2]),
                                     sys.argv[3])
  from crafter_tpu.parallel.mesh import distributed_init, dp_mesh, psum_stats
  distributed_init(f'localhost:{port}', num_processes, process_id)
  assert jax.process_count() == num_processes, jax.process_count()
  n_local = len(jax.local_devices())
  n_total = len(jax.devices())
  assert n_total == num_processes * n_local, (n_total, n_local)

  import jax.numpy as jnp
  from jax.sharding import NamedSharding, PartitionSpec as P
  from crafter_tpu.config import EnvConfig
  from crafter_tpu.env import home_keys, vec_reset, vec_step

  cfg = EnvConfig()
  n = 4 * n_total  # envs, data-parallel over every device of every process
  steps = 5
  mesh = dp_mesh()
  dp = NamedSharding(mesh, P('dp'))
  rep = NamedSharding(mesh, P())

  def fresh():
    return vec_reset(home_keys(0, n), cfg)

  shapes = jax.eval_shape(fresh)
  shardings = jax.tree.map(
      lambda s: dp if (s.ndim >= 1 and s.shape[0] == n) else rep, shapes)
  vs = jax.jit(fresh, out_shardings=shardings)()
  step = jax.jit(lambda v, a: vec_step(v, a, cfg, reset_batch=4))
  actions = jax.jit(lambda: jnp.zeros((n,), jnp.int32),
                    out_shardings=dp)()  # noop: no early deaths
  for _ in range(steps):
    vs, out, _ = step(vs, actions)

  # Every env advanced in lockstep across both processes.
  total_steps = int(jax.jit(lambda v: v.env.step.sum())(vs))
  assert total_steps == n * steps, (total_steps, n, steps)

  # Cross-process stats all-reduce (the config-4 psum path): psum_stats
  # sums per-host rows elementwise across devices, so the grand total is
  # its sum.
  total_hp = psum_stats(vs.env.player.inventory[:, 0], mesh)
  assert int(jnp.sum(total_hp)) == 9 * n, total_hp

  print(f'DIST OK process={process_id}/{num_processes} '
        f'devices={n_local}local/{n_total}global envs={n}', flush=True)


if __name__ == '__main__':
  main()
