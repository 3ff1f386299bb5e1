"""The batched world state pytree — entities live *in the grid*.

The reference scatters its state across an object graph — a ``World`` with a
mutable object list plus per-object Python attributes
(reference: crafter/engine.py:24-117, crafter/objects.py).  Round 1 replaced
that with a fixed-capacity structure-of-arrays entity table, but per-entity
point lookups (one-hot contractions over the 64×64 grid) still dominated the
tick.  This round the entity table is gone entirely: every entity attribute
is a *per-cell channel map*, so the whole simulation becomes shifts and
elementwise selects over ``(W, H)`` planes — the cellular-automaton
formulation the TPU's VPU was built for.  No gathers, no scatters, no
conflict matrices; thousands of envs step in lockstep under ``vmap``/``jit``
and the tick fuses into a handful of XLA kernels.

State of one environment:

* ``mat_map``  — the 64×64 material grid            (engine.py:38 `_mat_map`)
* ``ent``      — entity channel maps (type/health/aux/facing per cell); a
                 cell is occupied iff ``ent.etype != 0``.  This subsumes the
                 reference's object list *and* its `_obj_map` occupancy index
                 (engine.py:37-39): cell-uniqueness is structural.
* ``player``   — inventory/achievements/life counters + position
                 (objects.py:70-82)
* scalars      — step counter, PRNG key, reward bookkeeping

``ent.aux`` is the single per-type counter: zombie attack cooldown
(objects.py:288), skeleton reload (objects.py:320), plant growth
(objects.py:392).  ``ent.facing`` is a direction index into rules.DIRS
(arrows only, objects.py:356).  Fractional life counters (hunger/thirst/
fatigue/recover change by ±0.5, objects.py:133-167) are stored in *half
units* as integers so the dynamics are exact without floats.

Storage dtypes are compact (uint8/int16) to halve HBM traffic; the step
kernel widens to int32 on entry and narrows on exit (all inside the fused
program, so the narrow types only exist in memory, never in compute).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from . import rules
from .config import EnvConfig


@struct.dataclass
class EntMaps:
  """Per-cell entity channels (replaces the round-1 SoA table + obj_map).

  A cell holds at most one entity — the invariant the reference enforces
  with asserts (engine.py:53, :71) — so maps *are* the canonical entity
  store: no slot allocation, no capacity limit, no occupancy index.
  """

  etype: jax.Array   # (W*H,) uint8 entity type id (rules.E_*), 0 = empty
  health: jax.Array  # (W*H,) uint8
  aux: jax.Array     # (W*H,) int16 per-type counter (see module docstring)
  facing: jax.Array  # (W*H,) uint8 direction index (arrows)


@struct.dataclass
class Player:
  """Player record (objects.py:70-82)."""

  pos: jax.Array           # (2,) int32 cell position (also marked in ent)
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

  mat_map: jax.Array        # (W*H,) uint8 material ids, x-major flat
  ent: EntMaps
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


def init_player(cfg: EnvConfig) -> Player:
  tables = rules.TABLES
  return Player(
      pos=jnp.asarray(cfg.center, jnp.int32),  # env.py:71,76
      facing=jnp.int32(rules.DIR_DOWN),  # (0, +1), objects.py:72
      inventory=jnp.asarray(tables.item_initial, jnp.int32),
      achievements=jnp.zeros((rules.N_ACHIEVEMENTS,), jnp.int32),
      sleeping=jnp.asarray(False),
      hunger=jnp.int32(0), thirst=jnp.int32(0),
      fatigue=jnp.int32(0), recover=jnp.int32(0),
      last_health=jnp.int32(tables.item_initial[rules.ITEM_HEALTH]),
  )


def empty_ent_maps(cfg: EnvConfig) -> EntMaps:
  w, h = cfg.area
  return EntMaps(
      etype=jnp.zeros((w * h,), jnp.uint8),
      health=jnp.zeros((w * h,), jnp.uint8),
      aux=jnp.zeros((w * h,), jnp.int16),
      facing=jnp.zeros((w * h,), jnp.uint8),
  )


def add_entity(state: State, etype: int, pos, health: int = 0,
               aux: int = 0, facing: int = 0,
               cfg: EnvConfig | None = None) -> State:
  """Place one entity into the channel maps (test/tooling helper)."""
  from .config import DEFAULT_CONFIG
  h_dim = (cfg or DEFAULT_CONFIG).area[1]
  x, y = int(pos[0]), int(pos[1])
  c = x * h_dim + y
  ent = state.ent.replace(
      etype=state.ent.etype.at[c].set(etype),
      health=state.ent.health.at[c].set(health),
      aux=state.ent.aux.at[c].set(aux),
      facing=state.ent.facing.at[c].set(facing))
  if etype == rules.E_PLAYER:
    state = state.replace(
        player=state.player.replace(pos=jnp.asarray([x, y], jnp.int32)))
  return state.replace(ent=ent)


def chunk_index(pos: jax.Array, cfg: EnvConfig) -> Any:
  """(cell → chunk grid coordinates), engine.py:112-117."""
  return (pos[..., 0] // cfg.chunk_size[0], pos[..., 1] // cfg.chunk_size[1])


def semantic_view(state: State, cfg: EnvConfig) -> jax.Array:
  """Flat material+entity-type id map (engine.py:251-264).

  Entity type t maps to id N_MATERIALS + (t - 1), preserving the reference's
  [Player, Cow, Zombie, Skeleton, Arrow, Plant] registration order
  (env.py:47-49).  With entities living in the grid this is one select.
  """
  et = state.ent.etype.astype(jnp.int32)
  flat = jnp.where(et > 0, rules.N_MATERIALS + et - 1,
                   state.mat_map.astype(jnp.int32))
  return flat.reshape(flat.shape[:-1] + tuple(cfg.area))
