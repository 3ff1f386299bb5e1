"""The batched world state pytree.

The reference scatters its state across an object graph — a ``World`` with a
mutable object list plus per-object Python attributes
(reference: crafter/engine.py:24-117, crafter/objects.py).  Here the entire
simulation state of one environment is a flat pytree of fixed-shape arrays,
so thousands of worlds step in lockstep under ``vmap``/``jit`` and shard
across a device mesh:

* ``mat_map``   — the 64×64 material grid     (engine.py:38 `_mat_map`)
* ``obj_map``   — cell → entity slot + 1      (engine.py:39 `_obj_map`)
* entity SoA    — fixed-capacity table replacing the unbounded object list
                  (engine.py:37 `_objects`); slot 0 is always the player
* player record — inventory/achievements/life counters
                  (objects.py:70-82)
* scalars       — step counter, PRNG key, reward bookkeeping

Fractional life counters (hunger/thirst/fatigue/recover change by ±0.5,
objects.py:133-167) are stored in *half units* as integers so the dynamics
are exact without floats.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from . import rules
from .config import EnvConfig


@struct.dataclass
class Entities:
  """Structure-of-arrays entity table, capacity K (slot 0 = player).

  Replaces the reference's growing object list (engine.py:50-57).  A slot is
  live iff ``etype != 0``.  ``aux`` is the single per-type counter: zombie
  attack cooldown (objects.py:288), skeleton reload (objects.py:320), plant
  growth (objects.py:392).  ``facing`` is a direction index into rules.DIRS
  (arrows only, objects.py:356).
  """

  etype: jax.Array    # (K,) int32
  pos: jax.Array      # (K, 2) int32
  health: jax.Array   # (K,) int32
  aux: jax.Array      # (K,) int32
  facing: jax.Array   # (K,) int32


@struct.dataclass
class Player:
  """Player record (objects.py:70-82).  Position lives in entity slot 0."""

  facing: jax.Array        # () int32 direction index; starts down (0,+1)
  inventory: jax.Array     # (16,) int32, index 0 is health
  achievements: jax.Array  # (22,) int32 counts
  sleeping: jax.Array      # () bool
  hunger: jax.Array        # () int32, half units (objects.py:133-137)
  thirst: jax.Array        # () int32, half units (objects.py:138-141)
  fatigue: jax.Array       # () int32, half units (objects.py:142-151)
  recover: jax.Array       # () int32, half units (objects.py:153-167)
  last_health: jax.Array   # () int32 — wake-on-hurt memory (objects.py:169-172)


@struct.dataclass
class State:
  """Complete per-env simulation state (batched by vmapping every leaf)."""

  mat_map: jax.Array        # (W, H) uint8 material ids
  obj_map: jax.Array        # (W, H) int32 entity slot + 1, 0 = empty
  ent: Entities
  player: Player
  step: jax.Array           # () int32
  key: jax.Array            # PRNG key driving all stochasticity
  unlocked: jax.Array       # (22,) bool — env-level reward memory (env.py:99-104)
  env_last_health: jax.Array  # () int32 — reward Δhealth memory (env.py:97-98)
  chunk_touched: jax.Array  # (cx, cy) bool — which chunks ever held an object
  #                           (the reference only balances chunks present in
  #                           its defaultdict, env.py:90-95 + engine.py:36)


def daylight(step: jax.Array, day_length: int) -> jax.Array:
  """Day/night curve 1 - |cos(pi*((t/300)%1 + 0.3))|^3 (env.py:135-139)."""
  progress = (step.astype(jnp.float32) / day_length) % 1.0 + 0.3
  return 1.0 - jnp.abs(jnp.cos(jnp.pi * progress)) ** 3


def init_player() -> Player:
  tables = rules.TABLES
  return Player(
      facing=jnp.int32(rules.DIR_DOWN),  # (0, +1), objects.py:72
      inventory=jnp.asarray(tables.item_initial, jnp.int32),
      achievements=jnp.zeros((rules.N_ACHIEVEMENTS,), jnp.int32),
      sleeping=jnp.asarray(False),
      hunger=jnp.int32(0), thirst=jnp.int32(0),
      fatigue=jnp.int32(0), recover=jnp.int32(0),
      last_health=jnp.int32(tables.item_initial[rules.ITEM_HEALTH]),
  )


def empty_entities(cfg: EnvConfig) -> Entities:
  k = cfg.max_entities
  return Entities(
      etype=jnp.zeros((k,), jnp.int32),
      pos=jnp.zeros((k, 2), jnp.int32),
      health=jnp.zeros((k,), jnp.int32),
      aux=jnp.zeros((k,), jnp.int32),
      facing=jnp.zeros((k,), jnp.int32),
  )


def chunk_index(pos: jax.Array, cfg: EnvConfig) -> Any:
  """(cell → chunk grid coordinates), engine.py:112-117."""
  return (pos[..., 0] // cfg.chunk_size[0], pos[..., 1] // cfg.chunk_size[1])


def semantic_view(state: State, cfg: EnvConfig) -> jax.Array:
  """Flat material+entity-type id map (engine.py:251-264).

  Entity type t maps to id N_MATERIALS + (t - 1), preserving the reference's
  [Player, Cow, Zombie, Skeleton, Arrow, Plant] registration order
  (env.py:47-49).
  """
  canvas = state.mat_map.astype(jnp.int32)
  slot_type = state.ent.etype  # (K,)
  live = slot_type > 0
  ids = rules.N_MATERIALS + slot_type - 1
  # Route dead slots out of bounds (positive OOB — negative would wrap under
  # numpy indexing semantics); mode='drop' discards their writes.
  x = jnp.where(live, state.ent.pos[:, 0], cfg.area[0])
  y = state.ent.pos[:, 1]
  return canvas.at[x, y].set(ids, mode='drop')
