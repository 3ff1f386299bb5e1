"""Mesh construction and sharding helpers for the env batch."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
  """Initialize multi-host JAX (one process per host of a pod slice).

  On real multi-host TPU slices the arguments resolve automatically from
  the environment; pass them explicitly for CPU multi-process tests.
  """
  kwargs = {}
  if coordinator is not None:
    kwargs = dict(coordinator_address=coordinator,
                  num_processes=num_processes, process_id=process_id)
  jax.distributed.initialize(**kwargs)


def dp_mesh(n_devices: Optional[int] = None) -> Mesh:
  """A 1-D data-parallel mesh over the first n (default: all) devices."""
  devices = jax.devices()[:n_devices] if n_devices else jax.devices()
  return Mesh(np.array(devices), ('dp',))


def shard_batch(tree, mesh: Mesh, batch_size: int):
  """Place every leaf whose leading axis is the env batch on 'dp';
  replicate the rest."""
  dp = NamedSharding(mesh, P('dp'))
  rep = NamedSharding(mesh, P())

  def place(leaf):
    batched = (hasattr(leaf, 'ndim') and leaf.ndim >= 1
               and leaf.shape[0] == batch_size)
    return jax.device_put(leaf, dp if batched else rep)

  return jax.tree.map(place, tree)


def replicate(tree, mesh: Mesh):
  rep = NamedSharding(mesh, P())
  return jax.tree.map(lambda leaf: jax.device_put(leaf, rep), tree)


def make_sharded_group_step(mesh: Mesh, cfg, reset_batch: int):
  """The multi-chip engine step: a dp-sharded VecState advanced one
  balance-cadence group per call, each shard running its own fused
  Pallas kernels over its local env rows via ``shard_map``.

  jit's automatic (GSPMD) partitioning cannot split an opaque
  ``pallas_call``, so the jnp engine is the only auto-shardable one;
  this wrapper is how the Mosaic kernels scale across chips: env rows
  are independent, so the group step runs unmodified per shard and no
  collective is needed at all (stats reductions ride `psum_stats`).

  The reset pass becomes per-shard with ``ceil(reset_batch / n_shards)``
  slots per shard (never fewer slots per env row than the single-device
  pass would give): when no shard overflows, exactly the same envs reset
  with exactly the same fresh worlds as the single-device pass (each
  env's world derives from its own home key), so results are
  bit-identical — asserted in tests/test_sharding.py.  Caveat: the
  budget is per-shard, so if >rb_local deaths cluster on one shard in a
  single group, its overflow envs stay latched one extra group even
  though another shard had free slots — a latency (not correctness)
  difference vs the single-device pass; callers sizing reset_batch from
  the global death rate (tools/demo_64k.py) get slack from the ceil.

  Returns ``step(vs, actions) -> (vs, outs)`` (jitted) for (K, N)
  actions.
  """
  from jax import shard_map

  from ..env import vec_step_group

  n_shards = mesh.devices.size
  rb_local = max(1, -(-reset_batch // n_shards))

  def local_step(vs, actions):
    return vec_step_group(vs, actions, cfg, rb_local)

  def spec_of(leaf):
    # Batch leaves shard on 'dp'; the scalar tick counter replicates.
    return P() if leaf.ndim == 0 else P('dp')

  @jax.jit
  def step(vs, actions):
    in_specs = (jax.tree.map(spec_of, vs), P(None, 'dp'))
    out_specs = (jax.tree.map(spec_of, vs), P(None, 'dp'))
    return shard_map(local_step, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)(vs, actions)

  return step


def psum_stats(tree, mesh: Mesh):
  """All-reduce per-host stats over the mesh (ICI/DCN via XLA psum).

  Rank>=1 leaves are treated as 'dp'-sharded arrays and summed across the
  whole mesh.  Rank-0 leaves are treated as *per-process partial sums*
  (host-side counters): each process contributes its scalar once, and the
  result is the sum over all processes — a DCN allreduce on a multi-host
  slice, the identity on one.
  """
  from jax import shard_map

  def lift(leaf):
    if getattr(leaf, 'ndim', 0) >= 1:
      return leaf
    # Spread the scalar over this process's local devices so the mesh-wide
    # sum counts each process's contribution exactly once.
    n_local = jax.local_device_count()
    local = np.full((n_local,), np.float64(leaf) / n_local, np.float32)
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P('dp')), local)

  was_scalar = jax.tree.map(lambda l: getattr(l, 'ndim', 0) == 0, tree)
  lifted = jax.tree.map(lift, tree)

  @jax.jit
  def reduce(t):
    def f(local):
      def one(x, sq):
        out = jax.lax.psum(x, 'dp')
        return out.sum() if sq else out
      return jax.tree.map(one, local, was_scalar)
    return shard_map(f, mesh=mesh, in_specs=P('dp'), out_specs=P())(t)

  return reduce(lifted)
