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


def psum_stats(tree, mesh: Mesh):
  """All-reduce per-host stats over the mesh (ICI/DCN via XLA psum)."""
  from jax.experimental.shard_map import shard_map

  @jax.jit
  def reduce(t):
    def f(local):
      return jax.tree.map(lambda x: jax.lax.psum(x, 'dp'), local)
    return shard_map(f, mesh=mesh, in_specs=P('dp'), out_specs=P())(t)

  return reduce(tree)
