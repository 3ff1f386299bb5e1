"""The simulation tick as a cellular automaton over entity channel maps.

The reference advances the world by iterating a Python object list and
letting every entity mutate the world in place
(reference: crafter/env.py:83-118, crafter/objects.py).  Round 1 vectorized
that as masked updates over a fixed-capacity entity table, but every
table<->grid interaction (walkability of a move target, occupancy of a cell,
spawning) needed a one-hot contraction over the 64x64 grid per entity slot —
~100 launch-bound kernels and gigabytes of HBM intermediates per tick.

This round entities live *in the grid* (state.EntMaps): type, health, aux
counter, and facing are per-cell channels, and the entire tick is shifts and
elementwise selects over (W, H) planes plus a few full-map reductions — the
formulation the TPU's 8x128 VPU executes at memory speed with zero gathers:

* "may I step onto my dir-d neighbor?"  -> compare against a shifted
  material plane (one roll per direction, shared by every entity);
* "is that cell occupied?"              -> shifted occupancy plane;
* movement              -> four shifted claim planes + a priority select;
* "mob next to player"  -> the L1 distance plane vs the player position;
* spawns                -> masked writes into empty cells.

Phase order inside a tick mirrors the reference exactly:

1. step += 1, daylight update                      (env.py:84-85, :135-139)
2. player update — the player is always the first  (env.py:86-89; the player
   entry of the object list)                        is ``_objects[1]``)
3. mob/arrow/plant updates                          (env.py:87-89)
4. chunk balancing every 10 steps                   (env.py:90-95, :141-179)
5. reward / done / info                             (env.py:96-118)

Sequential-to-parallel mapping (SURVEY.md §7 hard part 3): the reference
updates entities one at a time, so later entities observe earlier entities'
moves.  Here all mobs decide simultaneously against the post-player state
and movement conflicts resolve by *direction priority*: when several movers
claim one destination cell, the claimant arriving along the lowest direction
index (rules.DIRS order) wins.  Deliberate deviations from the reference's
insertion-order priority, all rare and distribution-neutral (an episode's
outcome distribution is indistinguishable; see PARITY.md):

* conflict winners are picked by incoming direction, not list position;
* chain moves (B stepping into the cell A vacates within the same tick) are
  denied — a mover's target must be free at phase start;
* a mob's second move attempt after a failed skeleton retreat
  (objects.py:333-341 falls through to the elif chain) is dropped;
* an arrow damages the entity occupying its target at phase start even if
  that entity moves away this tick.

Replicated quirks (deliberately, for behavior parity):

* a mob whose health hit zero still attacks/shoots in the tick it is removed
  (objects.py:274-312 remove then fall through);
* corpses of mobs farther than the update distance persist and block cells
  (env.py:87-89 gates updates, including death cleanup, on distance);
* hitting a not-yet-removed corpse re-triggers the defeat/eat achievement
  (objects.py:197-213 checks ``health <= 0``, not a kill edge);
* the 3x3 "nearby" crafting window is *empty* when the player stands on the
  x==0 or y==0 edge (engine.py:95-103 slices [x-1:x+2] and numpy treats the
  -1 start as wrap, yielding an empty slice).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import rules
from . import state as state_lib
from .config import DEFAULT_CONFIG, EnvConfig
from .state import EntMaps, Player, State

DIRS = tuple((int(d[0]), int(d[1])) for d in rules.DIRS)

# Class indices for chunk balancing, in the reference's balancing order
# (env.py:143-155: Zombie, Skeleton, Cow).
BAL_CLASSES = (rules.E_ZOMBIE, rules.E_SKELETON, rules.E_COW)
# (material, span_dist, despawn_dist, spawn_prob, despawn_prob) per class
# (env.py:143-155).
BAL_MATERIAL = (rules.MAT_GRASS, rules.MAT_PATH, rules.MAT_GRASS)
BAL_SPAN = (6, 7, 5)
BAL_DESPAN = (0, 7, 5)
BAL_SPAWN_P = (0.3, 0.1, 0.01)
BAL_DESPAWN_P = (0.4, 0.1, 0.1)
# Initial health per entity type (cow 3, zombie 5, skeleton 3, plant 1;
# objects.py:267, :286, :319, :391).
TYPE_HEALTH = (0, 0, 3, 5, 3, 0, 1)


@struct.dataclass
class StepOut:
  """Per-tick results consumed by the env wrapper (env.py:96-118)."""

  reward: jax.Array        # () float32 — Δhealth/10 + 1.0 on new unlock
  done: jax.Array          # () bool — dead or episode length reached
  dead: jax.Array          # () bool — discount = 1 - dead (env.py:111)
  # () bool — the episode ended on THIS tick.  Equal to `done` for the
  # single env (the caller resets it, gym contract).  The batched path
  # (env.py:vec_step) latches `done` true while an env waits for an
  # auto-reset slot, so episode bookkeeping must key on `ended` — one
  # pulse per episode — or every waiting tick re-counts the episode.
  ended: jax.Array


# ---------------------------------------------------------------------------
# Plane primitives: shifts, one-hots, counter-based per-cell randomness.
# ---------------------------------------------------------------------------


def _shift_xy(a: jax.Array, dx: int, dy: int) -> jax.Array:
  """Translate plane content by (dx, dy); cells shifted in from outside are 0."""
  zero = jnp.zeros((), a.dtype)
  out = jnp.roll(a, (dx, dy), (0, 1))
  if dx > 0:
    out = out.at[:dx, :].set(zero)
  elif dx < 0:
    out = out.at[dx:, :].set(zero)
  if dy > 0:
    out = out.at[:, :dy].set(zero)
  elif dy < 0:
    out = out.at[:, dy:].set(zero)
  return out


def _push(a: jax.Array, d: int) -> jax.Array:
  """out[c] = a[c - DIRS[d]]: content travels one cell along direction d."""
  return _shift_xy(a, DIRS[d][0], DIRS[d][1])


def _pull(a: jax.Array, d: int) -> jax.Array:
  """out[c] = a[c + DIRS[d]]: what each cell sees at its dir-d neighbor."""
  return _shift_xy(a, -DIRS[d][0], -DIRS[d][1])


def _iota2(w: int, h: int):
  x = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0)
  y = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1)
  return x, y


def _onehot(pos: jax.Array, w: int, h: int) -> jax.Array:
  """(w, h) bool plane marking ``pos``; all-False when pos is out of bounds."""
  x, y = _iota2(w, h)
  return (x == pos[0]) & (y == pos[1])


def _read(plane: jax.Array, oh: jax.Array) -> jax.Array:
  """Value of a plane at a one-hot position (0 when the one-hot is empty)."""
  return jnp.sum(jnp.where(oh, plane, 0))


def _tread(table, idx: jax.Array):
  """table[idx] for a tiny (<= a few dozen rows) table and a scalar index.

  A one-hot compare-select instead of a dynamic slice: per-env scalar
  gathers serialize on TPU, 13 compares fuse into the surrounding program.
  Out-of-range indices read as 0 (the reference's None/out-of-world row 0).
  """
  t = jnp.asarray(table)
  oh = idx == jnp.arange(t.shape[0])
  if t.ndim == 1:
    out = jnp.sum(jnp.where(oh, t.astype(jnp.int32), 0))
    return out.astype(bool) if t.dtype == bool else out
  return jnp.sum(jnp.where(oh[:, None], t.astype(jnp.int32), 0), 0)


def _mat_in(m: jax.Array, member_table) -> jax.Array:
  """Per-cell set membership (e.g. walkability) as a compare chain.

  ``member_table`` is a static (N_MATERIALS,) bool array; the trace unrolls
  one compare per member material (<= 5), all fused on the VPU.
  """
  out = jnp.zeros(m.shape, bool)
  for i in np.flatnonzero(np.asarray(member_table)):
    out = out | (m == int(i))
  return out


def _i32c(value: int) -> jnp.ndarray:
  """A 32-bit constant as int32 (two's-complement wrap)."""
  return jnp.int32(np.uint32(value).view(np.int32))


def _srl(v: jax.Array, k: int) -> jax.Array:
  """Logical (unsigned) right shift on int32 lanes."""
  return jax.lax.shift_right_logical(v, jnp.int32(k))


def _fmix(v: jax.Array) -> jax.Array:
  """32-bit avalanche (murmur3-style finalizer) on int32 lanes.

  int32 with wrapping multiplies and logical shifts is bit-identical to
  the uint32 formulation and lowers on every backend incl. Mosaic.
  """
  v = v ^ _srl(v, 16)
  v = v * _i32c(0x7FEB352D)
  v = v ^ _srl(v, 15)
  v = v * _i32c(0x846CA68B)
  v = v ^ _srl(v, 16)
  return v


def _tick_seeds(key: jax.Array, step_: jax.Array):
  """Three per-phase int32 seeds from (episode key, step counter).

  ``key`` is the per-env episode key installed at reset; it stays fixed
  for the whole episode and every per-tick draw derives from counter
  hashing on (key, step, phase) — a batched 4-way threefry re-split was
  ~15% of the tick at 4096 envs.  (key, step) pairs never repeat because
  auto-reset installs a fresh episode key.
  """
  ki = jax.lax.bitcast_convert_type(jax.random.key_data(key), jnp.int32)
  base = _fmix(ki[0] ^ _fmix(ki[1] + step_ * _i32c(0x9E3779B9)))
  return (base, _fmix(base + _i32c(0x85EBCA6B)),
          _fmix(base + _i32c(0xC2B2AE35)))


def _seed_uniform(seed: jax.Array) -> jax.Array:
  """One float32 uniform in [0, 1) from an int32 seed (24-bit mantissa)."""
  return _srl(_fmix(seed), 8).astype(jnp.float32) * (1.0 / (1 << 24))


def _cell_bits(seed: jax.Array, chan: int, w: int, h: int) -> jax.Array:
  """Per-cell int32 random bits from a counter-based hash.

  Each (seed, channel, cell) triple maps through two avalanche rounds —
  the same construction as the worldgen hash (ops/noise.py:noise3_fast),
  an order of magnitude cheaper than threefry at these volumes.
  """
  x, y = _iota2(w, h)
  v = (seed + _i32c(0x9E3779B9) * jnp.int32(chan)
       + x * _i32c(0x85EBCA6B) + y * _i32c(0xC2B2AE35))
  return _fmix(_fmix(v))


def _toward(px, py, x, y, long_axis):
  """Per-cell axis-aligned step toward the player (objects.py:54-62).

  Picks the long axis when ``long_axis`` else the short axis; ties go to y
  (``dists[0] > dists[1]`` vs ``<=``).  Returns (mvx, mvy) planes in
  {-1, 0, 1}; a zero offset on the chosen axis yields a (0, 0) "move" that
  can never succeed (the reference moves onto its own occupied cell).
  """
  offx, offy = px - x, py - y
  # Logical blend, not select_n: Mosaic cannot select between i1 operands.
  long_axis = jnp.asarray(long_axis)
  use_x = ((long_axis & (jnp.abs(offx) > jnp.abs(offy)))
           | (~long_axis & (jnp.abs(offx) <= jnp.abs(offy))))
  # Compare-chain sign (jnp.sign's int lowering trips Mosaic's truncation).
  sgn = lambda v: jnp.where(v > 0, 1, jnp.where(v < 0, -1, 0))
  mvx = jnp.where(use_x, sgn(offx), 0)
  mvy = jnp.where(use_x, 0, sgn(offy))
  return mvx, mvy


def _dirvec(idx: jax.Array):
  """Direction index plane -> (dx, dy) component planes (rules.DIRS)."""
  dx = jnp.where(idx == 0, -1, jnp.where(idx == 1, 1, 0))
  dy = jnp.where(idx == 2, -1, jnp.where(idx == 3, 1, 0))
  return dx, dy


def _inside_scalar(pos: jax.Array, area) -> jax.Array:
  x, y = pos[..., 0], pos[..., 1]
  return (0 <= x) & (x < area[0]) & (0 <= y) & (y < area[1])


# ---------------------------------------------------------------------------
# Phase 1: player update (objects.py:99-261).
# ---------------------------------------------------------------------------


def _player_phase(state: State, action: jax.Array, seed: jax.Array,
                  cfg: EnvConfig):
  """Pure re-derivation of Player.update (objects.py:99-131).

  Scalar decision logic over a handful of one-hot plane reads; all world
  writes are masked selects at the (single) target cell.  Returns the
  post-player state plus a pending plant-spawn request (applied after the
  mob phase so the fresh plant does not update this tick, matching the
  reference's copy-at-loop-start iteration, engine.py:41-44).
  """
  t = rules.TABLES
  w, h = cfg.area
  p = state.player
  inv = p.inventory
  M = state.mat_map.astype(jnp.int32)
  T = state.ent.etype.astype(jnp.int32)
  Hp = state.ent.health.astype(jnp.int32)
  A = state.ent.aux.astype(jnp.int32)
  pos = p.pos
  energy_max = jnp.int32(t.item_max[rules.ITEM_ENERGY])

  # Sleep state machine (objects.py:103-108): while asleep the action is
  # forced to `sleep`; on full energy the player wakes, unlocks wake_up, and
  # the original action executes.
  full = inv[rules.ITEM_ENERGY] >= energy_max
  wake = p.sleeping & full
  action = jnp.where(p.sleeping & ~full, rules.A_SLEEP, action)
  sleeping = p.sleeping & ~wake
  ach = p.achievements.at[rules.ACH_ID['wake_up']].add(
      jnp.where(wake, 1, 0))

  # The do/place target uses the facing from *before* this tick's move
  # (objects.py:100 computes it at update start).
  target = pos + jnp.asarray(rules.DIRS)[p.facing]
  move_dir_idx = jnp.clip(action - 1, 0, 3)
  mtarget = pos + jnp.asarray(rules.DIRS)[move_dir_idx]
  oh_p = _onehot(pos, w, h)
  oh_t = _onehot(target, w, h)
  oh_mt = _onehot(mtarget, w, h)
  tmat = _read(M, oh_t)          # 0 = out of bounds (MAT_NONE)
  mtmat = _read(M, oh_mt)
  heremat = _read(M, oh_p)
  ttype = _read(T, oh_t)
  thp = _read(Hp, oh_t)
  taux = _read(A, oh_t)
  t_occupied = ttype > 0
  mt_occupied = _read(T, oh_mt) > 0

  is_move = (1 <= action) & (action <= 4)
  is_do = action == rules.A_DO
  is_sleep = action == rules.A_SLEEP
  is_place = (7 <= action) & (action <= 10)
  is_make = (11 <= action) & (action <= 16)

  # --- move (objects.py:174-179): facing set even when blocked. ----------
  facing = jnp.where(is_move, move_dir_idx, p.facing)
  can_move = (is_move & _inside_scalar(mtarget, cfg.area)
              & _tread(t.walkable_player, mtmat) & ~mt_occupied)
  new_pos = jnp.where(can_move, mtarget, pos)
  T = jnp.where(oh_p & can_move, 0, T)
  T = jnp.where(_onehot(new_pos, w, h) & can_move, rules.E_PLAYER, T)
  # Standing on lava after the move attempt is instant death
  # (objects.py:178-179) — checked at the post-move cell either way.
  on_lava = is_move & (jnp.where(can_move, mtmat, heremat)
                       == rules.MAT_LAVA)
  inv = inv.at[rules.ITEM_HEALTH].set(
      jnp.where(on_lava, 0, inv[rules.ITEM_HEALTH]))

  # --- do on an entity (objects.py:181-213). -----------------------------
  do_obj = is_do & t_occupied
  damage = jnp.max(jnp.stack([
      jnp.int32(1),
      jnp.where(inv[rules.ITEM_ID['wood_sword']] > 0, 2, 0),
      jnp.where(inv[rules.ITEM_ID['stone_sword']] > 0, 3, 0),
      jnp.where(inv[rules.ITEM_ID['iron_sword']] > 0, 5, 0)]))
  # Ripe plant: eat, reset growth, +4 food (objects.py:188-192).
  eat_plant = do_obj & (ttype == rules.E_PLANT) & (taux > 300)
  A = jnp.where(oh_t & eat_plant, 0, A)
  # Mobs take damage; health floors at 0 (objects.py:28-30 setter).
  hit_mob = do_obj & ((ttype == rules.E_ZOMBIE) | (ttype == rules.E_SKELETON)
                      | (ttype == rules.E_COW))
  hp_after = jnp.maximum(0, thp - damage)
  Hp = jnp.where(oh_t & hit_mob, hp_after, Hp)
  killed = hit_mob & (hp_after <= 0)
  eat_cow = killed & (ttype == rules.E_COW)
  food_gain = jnp.where(eat_plant, 4, 0) + jnp.where(eat_cow, 6, 0)
  inv = inv.at[rules.ITEM_FOOD].add(food_gain)
  ach = ach.at[rules.ACH_ID['eat_plant']].add(jnp.where(eat_plant, 1, 0))
  ach = ach.at[rules.ACH_ID['eat_cow']].add(jnp.where(eat_cow, 1, 0))
  ach = ach.at[rules.ACH_ID['defeat_zombie']].add(
      jnp.where(killed & (ttype == rules.E_ZOMBIE), 1, 0))
  ach = ach.at[rules.ACH_ID['defeat_skeleton']].add(
      jnp.where(killed & (ttype == rules.E_SKELETON), 1, 0))

  # --- do on a material (objects.py:214-229). ----------------------------
  do_mat = is_do & ~t_occupied
  drink_water = do_mat & (tmat == rules.MAT_WATER)
  can_collect = (do_mat & _tread(t.collectible, tmat)
                 & jnp.all(inv >= _tread(t.collect_require, tmat)))
  # Leaves are applied before the probability draw (objects.py:225-226).
  M = jnp.where(oh_t & can_collect, _tread(t.collect_leaves, tmat), M)
  prob = jnp.sum(jnp.where(tmat == jnp.arange(rules.N_MATERIALS),
                           jnp.asarray(t.collect_prob), 0.0))
  got = _seed_uniform(seed) <= prob
  receive = can_collect & got
  inv = inv + jnp.where(receive, _tread(t.collect_receive, tmat), 0)
  cach = _tread(t.collect_ach, tmat)
  ach = ach.at[jnp.where(receive & (cach >= 0), cach,
                         rules.N_ACHIEVEMENTS)].add(1, mode='drop')

  # --- sleep (objects.py:117-119). ---------------------------------------
  sleeping = sleeping | (is_sleep & (inv[rules.ITEM_ENERGY] < energy_max))

  # --- place (objects.py:231-249). ---------------------------------------
  pidx = jnp.clip(action - 7, 0, 3)
  place_ok = (is_place & ~t_occupied
              & _tread(jnp.asarray(t.place_where)[pidx], tmat)
              & jnp.all(inv >= jnp.asarray(t.place_uses)[pidx]))
  inv = inv - jnp.where(place_ok, jnp.asarray(t.place_uses)[pidx], 0)
  place_mat = place_ok & jnp.asarray(t.place_is_material)[pidx]
  M = jnp.where(oh_t & place_mat, jnp.asarray(t.place_material)[pidx], M)
  plant_spawn = place_ok & ~jnp.asarray(t.place_is_material)[pidx]
  ach = ach.at[jnp.where(place_ok, jnp.asarray(t.place_ach)[pidx],
                         rules.N_ACHIEVEMENTS)].add(1, mode='drop')

  # --- make (objects.py:251-261): 3x3 nearby window with the numpy
  # empty-slice quirk at the x==0 / y==0 edges (engine.py:95-103).
  midx = jnp.clip(action - 11, 0, 5)
  x, y = _iota2(w, h)
  window = ((jnp.abs(x - pos[0]) <= 1) & (jnp.abs(y - pos[1]) <= 1)
            & (pos[0] >= 1) & (pos[1] >= 1))
  nearby = jnp.any(
      window[None] & (M[None] == jnp.arange(rules.N_MATERIALS)[:, None, None]),
      (1, 2))
  make_ok = (is_make
             & jnp.all(nearby | ~jnp.asarray(t.make_nearby)[midx])
             & jnp.all(inv >= jnp.asarray(t.make_uses)[midx]))
  inv = inv - jnp.where(make_ok, jnp.asarray(t.make_uses)[midx], 0)
  inv = inv.at[jnp.asarray(t.make_gives_item)[midx]].add(
      jnp.where(make_ok, jnp.asarray(t.make_gives_count)[midx], 0))
  ach = ach.at[jnp.where(make_ok, jnp.asarray(t.make_ach)[midx],
                         rules.N_ACHIEVEMENTS)].add(1, mode='drop')

  # --- life stats, in half units (objects.py:133-151). -------------------
  hunger = jnp.where(eat_cow, 0, p.hunger)        # objects.py:212
  thirst = jnp.where(drink_water, 0, p.thirst)    # objects.py:218
  hunger = hunger + jnp.where(sleeping, 1, 2)
  food_tick = hunger > 50
  hunger = jnp.where(food_tick, 0, hunger)
  inv = inv.at[rules.ITEM_FOOD].add(jnp.where(food_tick, -1, 0))
  thirst = thirst + jnp.where(sleeping, 1, 2)
  drink_tick = thirst > 40
  thirst = jnp.where(drink_tick, 0, thirst)
  inv = inv.at[rules.ITEM_DRINK].add(jnp.where(drink_tick, -1, 0))
  fatigue = jnp.where(sleeping, jnp.minimum(p.fatigue - 2, 0), p.fatigue + 2)
  gain_e = fatigue < -20
  lose_e = fatigue > 60
  fatigue = jnp.where(gain_e | lose_e, 0, fatigue)
  inv = inv.at[rules.ITEM_ENERGY].add(
      jnp.where(gain_e, 1, 0) + jnp.where(lose_e, -1, 0))

  # --- health regen/degen (objects.py:153-167). --------------------------
  necessities = ((inv[rules.ITEM_FOOD] > 0) & (inv[rules.ITEM_DRINK] > 0)
                 & ((inv[rules.ITEM_ENERGY] > 0) | sleeping))
  recover = p.recover + jnp.where(
      necessities, jnp.where(sleeping, 4, 2), jnp.where(sleeping, -1, -2))
  regen = recover > 50
  degen = recover < -30
  recover = jnp.where(regen | degen, 0, recover)
  hp = jnp.maximum(0, inv[rules.ITEM_HEALTH]
                   + jnp.where(regen, 1, 0) + jnp.where(degen, -1, 0))
  inv = inv.at[rules.ITEM_HEALTH].set(hp)

  # --- clamp, then wake on hurt (objects.py:126-131, :169-172). ----------
  inv = jnp.clip(inv, 0, jnp.asarray(t.item_max))
  hp = inv[rules.ITEM_HEALTH]
  sleeping = sleeping & ~(hp < p.last_health)

  player = Player(
      pos=new_pos, facing=facing, inventory=inv, achievements=ach,
      sleeping=sleeping, hunger=hunger, thirst=thirst, fatigue=fatigue,
      recover=recover, last_health=hp)
  state = state.replace(
      mat_map=M.astype(state.mat_map.dtype),
      ent=state.ent.replace(etype=T.astype(state.ent.etype.dtype),
                            health=Hp.astype(state.ent.health.dtype),
                            aux=A.astype(state.ent.aux.dtype)),
      player=player)
  return state, plant_spawn, jnp.where(plant_spawn, target,
                                       jnp.full((2,), -1, jnp.int32))


# ---------------------------------------------------------------------------
# Phase 2: mobs, arrows, plants (objects.py:264-411).
#
# The phase is written ONCE as a flat-plane core over the last axis
# (`_mob_core`), shared verbatim by two backends:
#   * jnp: per-env (C,) planes under vmap (CPU and the single-env path);
#   * pallas: (E, C) blocks inside one fused TPU kernel, every intermediate
#     in VMEM (see `_mob_phase_pallas`) — the XLA path materializes ~100
#     (N, C) intermediates to HBM, which dominates the tick.
# Both backends execute the same trace, so results are bit-identical.
# ---------------------------------------------------------------------------


def _mob_core(cell, M, T, Hp, A, F, px, py, sleeping, seed, plant_idx, cfg):
  """Mob/arrow/plant tick over flat cell planes (last axis = W*H cells).

  All non-player entities decide simultaneously in the *source-cell*
  domain on the post-player state, movement carries every channel through
  four shifted claim planes, and post-move effects (zombie melee, plant
  damage) read the moved planes.

  ``cell`` is the int32 plane of flat cell indices (built by the backend —
  1-D iota is jnp-only, 2-D broadcasted iota is Mosaic-only).  Scalars
  (px/py/sleeping/seed/plant_idx) broadcast against the planes: shape ()
  per env under vmap, (E, 1) inside the kernel.  Returns the five updated
  planes plus the player's melee+arrow damage (reduced over cells,
  keepdims).
  """
  t = rules.TABLES
  w, h = cfg.area

  x = cell // h
  y = cell % h

  def roll(a, k):
    # Mosaic cannot rotate/concatenate i1 vectors: roll bools as int32.
    if a.dtype == jnp.bool_:
      return jnp.roll(a.astype(jnp.int32), k, axis=-1) != 0
    return jnp.roll(a, k, axis=-1)

  def push(a, d):
    """out[c] = a[c - DIRS[d]]: content travels one cell along d."""
    dx, dy = DIRS[d]
    out = roll(a, dx * h + dy)
    valid = ((x - dx >= 0) & (x - dx < w)) if dx else ((y - dy >= 0)
                                                      & (y - dy < h))
    return out & valid if a.dtype == jnp.bool_ else jnp.where(valid, out, 0)

  def pull(a, d):
    """out[c] = a[c + DIRS[d]]: what each cell sees at its dir-d neighbor."""
    dx, dy = DIRS[d]
    out = roll(a, -(dx * h + dy))
    valid = ((x + dx >= 0) & (x + dx < w)) if dx else ((y + dy >= 0)
                                                      & (y + dy < h))
    return out & valid if a.dtype == jnp.bool_ else jnp.where(valid, out, 0)

  def read_at(plane, idx):
    return jnp.sum(jnp.where(cell == idx, plane, 0), -1, keepdims=True)

  # Per-cell randomness: the 7 probability gates + the 2-bit direction draw
  # are sliced as 16-bit fields out of FOUR avalanche hashes instead of one
  # hash per draw — the hash chain (two fmix rounds, four int32 multiplies)
  # is the single most expensive item in the kernel, and a `u < p` float
  # compare on a 24-bit uniform is equivalent to an integer compare of a
  # 16-bit field against round(p * 2^16) up to |dp| <= 2^-17, far below
  # anything the distribution tests (or 1M-step score reproduction) can
  # see.  Fields of one hash are disjoint bit ranges — iid draws.
  hb = [_cell_bits_plane(seed, c, x, y) for c in range(4)]
  lo = lambda b: b & jnp.int32(0xFFFF)
  hi = lambda b: _srl(b, 16)
  u16 = (lo(hb[0]), hi(hb[0]), lo(hb[1]), hi(hb[1]),
         lo(hb[2]), hi(hb[2]), lo(hb[3]))
  P16 = lambda p: jnp.int32(round(p * 65536.0))

  pdist = jnp.abs(x - px) + jnp.abs(y - py)
  pending = cell == plant_idx   # all-False when plant_idx < 0

  is_cow = T == rules.E_COW
  is_zom = T == rules.E_ZOMBIE
  is_skel = T == rules.E_SKELETON
  is_arrow = T == rules.E_ARROW
  is_plant = T == rules.E_PLANT
  active = (T > rules.E_PLAYER) & (pdist < cfg.update_distance)
  # Mobs at zero health are removed at the start of their own update but
  # still run their attack logic this tick (objects.py:274-276, :294-296,
  # :327-329 remove then fall through).
  dying = active & (Hp <= 0) & (is_cow | is_zom | is_skel)

  # --- decisions (source-cell domain) ------------------------------------
  rdx, rdy = _dirvec(_srl(hb[3], 16) & 3)
  # Cow: random walk with p=0.5 (objects.py:277-279).
  cow_wants = u16[0] < P16(0.5)
  # Zombie: chase within dist 8 with p=0.9 (long axis p=0.8), else random
  # walk (objects.py:297-301).
  chase = (pdist <= 8) & (u16[0] < P16(0.9))
  twx, twy = _toward(px, py, x, y, u16[1] < P16(0.8))
  zx = jnp.where(chase, twx, rdx)
  zy = jnp.where(chase, twy, rdy)
  # Skeleton (objects.py:327-341): retreat at dist<=3; on a failed retreat
  # fall through the elif chain (shoot / approach / walk).
  retreat = pdist <= 3
  rwx, rwy = _toward(px, py, x, y, u16[2] < P16(0.6))
  c_shoot = (pdist <= 5) & (u16[3] < P16(0.5))
  c_approach = (pdist <= 8) & (u16[4] < P16(0.3))
  c_walk = u16[5] < P16(0.2)
  awx, awy = _toward(px, py, x, y, u16[6] < P16(0.6))
  appr = ~c_shoot & c_approach
  sox = jnp.where(appr, awx, rdx)
  soy = jnp.where(appr, awy, rdy)
  s_wants_other = ~c_shoot & (c_approach | c_walk)
  sx = jnp.where(retreat, -rwx, sox)
  sy = jnp.where(retreat, -rwy, soy)
  skel_wants = retreat | s_wants_other
  # Arrows fly along their facing (objects.py:373-384).
  avx, avy = _dirvec(F)

  mvx = jnp.where(is_zom, zx, jnp.where(is_skel, sx,
                                        jnp.where(is_arrow, avx, rdx)))
  mvy = jnp.where(is_zom, zy, jnp.where(is_skel, sy,
                                        jnp.where(is_arrow, avy, rdy)))

  # Per-cell target attributes via per-direction shifted planes.
  occ0 = (T > 0) | pending   # the fresh plant's cell counts as occupied
  #                            for every check this tick (objects.py:248)
  # Roll diet: material (bits 0-3) and occupancy (bit 4) travel in ONE
  # pulled plane per direction (8 rolls -> 4).
  q = M | (occ0.astype(jnp.int32) << 4)
  tmat = jnp.zeros_like(M)
  tocc = jnp.zeros_like(pending)
  inside_t = jnp.zeros_like(pending)
  for d in range(4):
    dx, dy = DIRS[d]
    sel = (mvx == dx) & (mvy == dy)
    qd = pull(q, d)
    tmat = jnp.where(sel, qd & 15, tmat)
    tocc = tocc | (sel & (qd >= 16))
    nx, ny = x + dx, y + dy
    inside_t = inside_t | (
        sel & (nx >= 0) & (nx < w) & (ny >= 0) & (ny < h))
  moving = (mvx != 0) | (mvy != 0)  # a (0,0) `toward` never succeeds
  # A cell "targeting itself" (zero move vector) reads its own attributes
  # in the reference; feasibility fails there via the occupancy check.
  tmat = jnp.where(moving, tmat, M)
  tocc = (moving & tocc) | (~moving & occ0)
  inside_t = inside_t | ~moving

  # Arrow impact decisions (objects.py:373-384): hit / despawn / fly.
  a_hit = is_arrow & active & tocc
  a_block = (is_arrow & active & ~a_hit
             & ~_mat_in(tmat, t.walkable_arrow))
  a_fly = is_arrow & active & ~a_hit & ~a_block

  wants = active & ~dying & (
      (is_cow & cow_wants) | is_zom | (is_skel & skel_wants) | a_fly)

  # --- movement feasibility ----------------------------------------------
  walk_ok = ((is_arrow & _mat_in(tmat, t.walkable_arrow))
             | (~is_arrow & _mat_in(tmat, t.walkable_mob)))
  feasible = inside_t & walk_ok & ~tocc
  valid = wants & feasible & moving

  # --- arrow impacts: damage at the target cell, applied pre-move so it
  # travels with a mob that also moves this tick (the round-1 semantics).
  # Arrows destroy tables/furnaces into path (objects.py:380-382); the
  # masked select is idempotent, so several arrows smashing one cell are
  # fine (unlike round 1's summed scatter).  Roll diet: hit-damage (bit 0)
  # and smash (bit 1) travel in ONE pushed plane per direction (8 -> 4).
  smash_src = a_block & ((tmat == rules.MAT_TABLE)
                         | (tmat == rules.MAT_FURNACE))
  fx = a_hit.astype(jnp.int32) | (smash_src.astype(jnp.int32) << 1)
  dmg = jnp.zeros_like(M)
  smash = jnp.zeros_like(pending)
  for d in range(4):
    fd = push(jnp.where(F == d, fx, 0), d)
    dmg = dmg + 2 * (fd & 1)
    smash = smash | (fd >= 2)
  player_dmg = read_at(dmg, px * h + py)
  Hp = jnp.maximum(0, Hp - jnp.where(T > rules.E_PLAYER, dmg, 0))
  M = jnp.where(smash, rules.MAT_PATH, M)

  # --- plants grow before moving planes are built (objects.py:405-407).
  reload = jnp.where(active & is_skel, jnp.maximum(0, A - 1), A)
  A = jnp.where(active & is_plant, A + 1, A)
  A = jnp.where(is_skel, reload, A)

  # --- movement: claim + carry in ONE pushed plane per direction ---------
  # The packed plane holds everything a target cell needs from its source:
  # type (bits 0-2), facing (3-4), post-damage health (5-12), counter
  # (13-16; only mob cooldown/reload/arrow=0 ever moves — plants are not
  # movers — so 4 bits suffice), move direction (17-18), validity (19).
  # Cuts 8 claim rolls + 16 carry rolls down to 4 pushes + 4 pulls; ties
  # keep the direction-priority order of the reference's claim scan.
  pdir = jnp.where(mvx == -1, 0, jnp.where(mvx == 1, 1,
                                           jnp.where(mvy == -1, 2, 3)))
  pk = (T | (F << 3) | (Hp << 5) | ((A & 15) << 13) | (pdir << 17)
        | (valid.astype(jnp.int32) << 19))
  taken = jnp.zeros_like(pending)
  success = jnp.zeros_like(pending)
  T1, H1, A1, F1 = T, Hp, A, F
  for d in range(4):
    pd = push(pk, d)
    win_d = (pd >= (1 << 19)) & ((_srl(pd, 17) & 3) == d) & ~taken
    taken = taken | win_d
    T1 = jnp.where(win_d, pd & 7, T1)
    F1 = jnp.where(win_d, _srl(pd, 3) & 3, F1)
    H1 = jnp.where(win_d, _srl(pd, 5) & 255, H1)
    A1 = jnp.where(win_d, _srl(pd, 13) & 15, A1)
    mover_d = valid & (mvx == DIRS[d][0]) & (mvy == DIRS[d][1])
    success = success | (pull(win_d, d) & mover_d)
  # Vacated cells empty out; a claim target was empty pre-move (tocc), so
  # no cell is both a winner and a successful mover.
  T1 = jnp.where(success, 0, T1)

  # --- skeleton shooting decision (objects.py:330-351).  A dead skeleton
  # "moves" whenever the retreat cell is free (World.move no-ops on removed
  # objects but Object.move still reports success, engine.py:67-69).
  s_moved = ((dying & retreat & feasible)
             | (~dying & retreat & success))
  shoot = active & is_skel & ~s_moved & c_shoot & (reload == 0)
  shvx, shvy = _toward(px, py, x, y, True)

  # --- zombie melee (objects.py:302-312): post-move adjacency, cooldown
  # counts down only while adjacent, 7 damage if the player sleeps.
  z_adj = (T1 == rules.E_ZOMBIE) & (pdist <= 1)
  z_att = z_adj & (A1 == 0)
  A1 = jnp.where(z_adj, jnp.where(z_att, 5, A1 - 1), A1)
  zdmg = jnp.sum(
      jnp.where(z_att, jnp.where(sleeping, 7, 2), 0), -1, keepdims=True)
  player_dmg = player_dmg + zdmg

  # --- plant damage from adjacent mobs (objects.py:408-411): post-move
  # positions, pre-removal liveness (dying mobs still occupy their cell).
  hostile = ((T1 == rules.E_COW) | (T1 == rules.E_ZOMBIE)
             | (T1 == rules.E_SKELETON))
  nbr_hostile = jnp.zeros_like(pending)
  for d in range(4):
    nbr_hostile = nbr_hostile | push(hostile, d)
  plant_hit = active & is_plant & nbr_hostile  # plants never move
  H1 = jnp.where(plant_hit, jnp.maximum(0, H1 - 1), H1)
  plant_dead = active & is_plant & (H1 <= 0)

  # --- removals ----------------------------------------------------------
  removed = dying | a_hit | a_block | plant_dead
  T1 = jnp.where(removed, 0, T1)

  # --- pending plant materializes (before arrow spawns, round-1 order).
  T1 = jnp.where(pending, rules.E_PLANT, T1)
  H1 = jnp.where(pending, 1, H1)
  A1 = jnp.where(pending, 0, A1)

  # --- arrow spawns (objects.py:344-351): the target cell must be free
  # *post-move* and arrow-walkable; reload resets only on a real shot.
  spawn_free = (T1 == 0) & ~pending & _mat_in(M, t.walkable_arrow)
  arrow_ok_src = jnp.zeros_like(pending)
  staken = jnp.zeros_like(pending)
  for d in range(4):
    spawn_d = shoot & (shvx == DIRS[d][0]) & (shvy == DIRS[d][1])
    win_d = push(spawn_d, d) & spawn_free & ~staken
    staken = staken | win_d
    T1 = jnp.where(win_d, rules.E_ARROW, T1)
    H1 = jnp.where(win_d, 0, H1)
    A1 = jnp.where(win_d, 0, A1)
    F1 = jnp.where(win_d, d, F1)
    arrow_ok_src = arrow_ok_src | (pull(win_d, d) & spawn_d)
  A1 = jnp.where(arrow_ok_src, 4, A1)  # shooter reloads

  return M, T1, H1, A1, F1, player_dmg


def _cell_bits_plane(seed, chan: int, x, y):
  """Per-cell int32 random bits from (x, y) coordinate planes."""
  v = (seed + _i32c(0x9E3779B9) * jnp.int32(chan)
       + x * _i32c(0x85EBCA6B) + y * _i32c(0xC2B2AE35))
  return _fmix(_fmix(v))


def _cell_uniform_xy(seed, chan: int, x, y):
  """Per-cell iid uniforms in [0, 1) from (x, y) coordinate planes.

  The reference draws lazily from one MT19937 stream as its Python loops
  touch entities (objects.py passim); each draw is consumed at most once,
  so iid per-cell uniforms give the identical joint distribution.
  """
  v = (seed + _i32c(0x9E3779B9) * jnp.int32(chan)
       + x * _i32c(0x85EBCA6B) + y * _i32c(0xC2B2AE35))
  bits = _fmix(_fmix(v))
  return _srl(bits, 8).astype(jnp.float32) * (1.0 / (1 << 24))


def _mob_core_args(state: State, seed: jax.Array, plant_spawn, plant_pos,
                   cfg: EnvConfig, widen: bool = True):
  """Flatten one env's state into `_mob_core` operands (minus `cell`).

  ``widen=False`` keeps the storage dtypes (the Pallas path widens inside
  the kernel so HBM only ever sees the narrow planes)."""
  w, h = cfg.area
  flat = lambda m: (m.reshape(m.shape[:-2] + (w * h,)).astype(jnp.int32)
                    if widen else m.reshape(m.shape[:-2] + (w * h,)))

  plant_idx = jnp.where(plant_spawn,
                        plant_pos[..., 0] * h + plant_pos[..., 1], -1)
  return (flat(state.mat_map), flat(state.ent.etype),
          flat(state.ent.health), flat(state.ent.aux),
          flat(state.ent.facing), state.player.pos[..., 0],
          state.player.pos[..., 1], state.player.sleeping, seed, plant_idx)


def _mob_finish(state: State, outs, cfg: EnvConfig) -> State:
  """Fold `_mob_core` outputs back into the state pytree (one env)."""
  w, h = cfg.area
  M, T1, H1, A1, F1, player_dmg = outs
  grid = lambda p, ref: p.reshape(p.shape[:-1] + (w, h)).astype(ref.dtype)
  player = state.player.replace(
      inventory=state.player.inventory.at[rules.ITEM_HEALTH].set(
          jnp.maximum(0, state.player.inventory[rules.ITEM_HEALTH]
                      - player_dmg[..., 0])))
  ent = EntMaps(etype=grid(T1, state.ent.etype),
                health=grid(H1, state.ent.health),
                aux=grid(A1, state.ent.aux),
                facing=grid(F1, state.ent.facing))
  return state.replace(mat_map=grid(M, state.mat_map), ent=ent,
                       player=player)


def _mob_phase(state: State, seed: jax.Array, cfg: EnvConfig,
               plant_spawn, plant_pos) -> State:
  """jnp backend: one env, flat (C,) planes."""
  w, h = cfg.area
  cell = jnp.arange(w * h, dtype=jnp.int32)
  outs = _mob_core(cell, *_mob_core_args(state, seed, plant_spawn, plant_pos,
                                         cfg), cfg)
  return _mob_finish(state, outs, cfg)


# ---------------------------------------------------------------------------
# Phase 3: chunk balancing (env.py:141-179).
# ---------------------------------------------------------------------------


def _chunk_reduce(grid: jax.Array, cfg: EnvConfig, fill, op) -> jax.Array:
  """Per-chunk reduction (W, H) -> (ncx, ncy) without any transpose.

  The (ncx, csx, ncy, csy) reshape of the padded grid is a free row-major
  split; reducing axes (1, 3) directly avoids the Mosaic relayout a
  (n_chunks, chunk_cells) view would cost on every balance tick.
  """
  (csx, csy), (ncx, ncy) = cfg.chunk_size, cfg.n_chunks
  pad = jnp.full((ncx * csx, ncy * csy), fill, grid.dtype)
  pad = pad.at[:grid.shape[0], :grid.shape[1]].set(grid)
  return op(pad.reshape(ncx, csx, ncy, csy), axis=(1, 3))


def _chunk_broadcast(vals: jax.Array, cfg: EnvConfig) -> jax.Array:
  """(ncx, ncy) per-chunk values -> (W, H) plane."""
  (csx, csy), (ncx, ncy) = cfg.chunk_size, cfg.n_chunks
  w, h = cfg.area
  full = jnp.broadcast_to(vals[:, None, :, None],
                          (ncx, csx, ncy, csy)).reshape(ncx * csx, ncy * csy)
  return full[:w, :h]


def _balance_phase(state: State, seed: jax.Array, cfg: EnvConfig):
  """Spawn/despawn mobs toward daylight-dependent per-chunk targets.

  The reference visits every chunk that ever held an object (a defaultdict
  grown on add/move, engine.py:36, :57, :78-79) and, per class, spawns at a
  random material cell or despawns a random creature (env.py:157-179).
  Uniform picks become per-chunk argmaxes of per-cell random scores (made
  unique by mixing the in-chunk cell rank into the low bits).
  """
  t = rules.TABLES
  w, h = cfg.area
  (csx, csy), (ncx, ncy) = cfg.chunk_size, cfg.n_chunks
  nch = ncx * ncy
  M = state.mat_map.astype(jnp.int32)
  T = state.ent.etype.astype(jnp.int32)
  light = state_lib.daylight(state.step, cfg.day_length)
  ppos = state.player.pos
  x, y = _iota2(w, h)
  pdist = jnp.abs(x - ppos[0]) + jnp.abs(y - ppos[1])



  # Per-chunk, per-class creature counts and material space — all (ncx,
  # ncy) chunk planes from transpose-free axis reductions.
  chsum = lambda mask: _chunk_reduce(mask.astype(jnp.int32), cfg, 0, jnp.sum)
  counts = [chsum(T == e) for e in BAL_CLASSES]
  grass_n = chsum(M == rules.MAT_GRASS)
  path_n = chsum(M == rules.MAT_PATH)
  touched = state.chunk_touched                       # (ncx, ncy)

  # Spawn/despawn targets (env.py:143-155).  int() truncation on the floats.
  zeros = jnp.zeros((ncx, ncy))
  tmin = [jnp.where(grass_n < 50, 0.0, 3.5 - 3 * light),
          jnp.where(path_n < 6, 0.0, 1.0),
          jnp.where(grass_n < 30, 0.0, 1.0)]
  tmax = [zeros + (3.5 - 3 * light), zeros + 2.0, zeros + (1.5 + light)]

  # Spawn/despawn gate draws from the same counter hash as the cell picks
  # (disjoint stream: negative channel offsets vs pick()'s channels 8-14).
  gidx = jnp.arange(nch * 6, dtype=jnp.int32).reshape(ncx, ncy, 3, 2)
  gate = (_srl(_fmix(_fmix(seed + _i32c(0x27D4EB2F) * (gidx + 1))), 8)
          .astype(jnp.float32) * (1.0 / (1 << 24)))
  want_spawn, want_despawn = [], []
  for i in range(len(BAL_CLASSES)):
    ws = (touched & (counts[i] < jnp.trunc(tmin[i]).astype(jnp.int32))
          & (gate[..., i, 0] < BAL_SPAWN_P[i]))
    want_spawn.append(ws)
    want_despawn.append(
        touched & ~ws & (counts[i] > jnp.trunc(tmax[i]).astype(jnp.int32))
        & (gate[..., i, 1] < BAL_DESPAWN_P[i]))

  # Unique-within-chunk random scores: random high bits, cell rank low bits.
  rank = ((x % csx) * csy + y % csy).astype(jnp.int32)  # < csx*csy <= 4096

  def pick(member, chan):
    """Uniform random member cell per chunk -> (W, H) one-pick-per-chunk."""
    bits = _srl(_cell_bits(seed, chan, w, h), 13)
    score = jnp.where(member, (bits << 12) | rank, -1)
    best = _chunk_reduce(score, cfg, -1, jnp.max)       # (ncx, ncy)
    return member & (score == _chunk_broadcast(best, cfg)) & (score >= 0)

  despawn = jnp.zeros((w, h), bool)
  spawn_masks = []
  for i, etype in enumerate(BAL_CLASSES):
    # Despawn: uniform random creature of the class in the chunk, removed
    # when far enough from the player (env.py:175-179).
    d_pick = pick(T == etype, 8 + i)
    despawn = despawn | (
        d_pick & _chunk_broadcast(want_despawn[i], cfg)
        & (pdist >= BAL_DESPAN[i]))
    # Spawn: uniform random cell of the class material (occupied cells are
    # candidates too — the reference picks first, then fails on occupancy).
    s_pick = pick(M == BAL_MATERIAL[i], 11 + i)
    spawn_masks.append(
        s_pick & _chunk_broadcast(want_spawn[i], cfg)
        & (pdist >= BAL_SPAN[i]))
  return despawn, spawn_masks


def _apply_balance(state: State, despawn: jax.Array, spawn_masks,
                   cfg: EnvConfig) -> State:
  """Apply balance deltas: removals, then spawns in class-priority order."""
  T = state.ent.etype.astype(jnp.int32)
  Hp = state.ent.health.astype(jnp.int32)
  A = state.ent.aux.astype(jnp.int32)
  T = jnp.where(despawn & (T > rules.E_PLAYER), 0, T)
  for i, etype in enumerate(BAL_CLASSES):
    ok = spawn_masks[i] & (T == 0)
    T = jnp.where(ok, etype, T)
    Hp = jnp.where(ok, TYPE_HEALTH[etype], Hp)
    A = jnp.where(ok, 0, A)
  ent = state.ent.replace(etype=T.astype(state.ent.etype.dtype),
                          health=Hp.astype(state.ent.health.dtype),
                          aux=A.astype(state.ent.aux.dtype))
  return state.replace(ent=ent)


# ---------------------------------------------------------------------------
# The tick.
# ---------------------------------------------------------------------------


def step(state: State, action: jax.Array,
         cfg: EnvConfig = DEFAULT_CONFIG,
         balance: bool | None = None) -> Tuple[State, StepOut]:
  """One simulation tick (env.py:83-118).  Pure; jit/vmap/shard at will.

  ``balance``: None runs chunk balancing on the reference's per-env
  cadence (every 10th step of each env, env.py:90) under a ``lax.cond`` so
  9 of 10 ticks skip the phase's compute.  True/False force the phase
  on/off for this tick — the batched path (env.py:vec_step) uses a *global*
  cadence instead; since auto-resets desynchronize env-local step counts
  anyway, the cadence phase relative to episode start is the only
  (distribution-neutral) difference.
  """
  step_ = state.step + 1
  s_player, s_mob, s_balance = _tick_seeds(state.key, step_)
  state = state.replace(step=step_)

  state, plant_spawn, plant_pos = _player_phase(state, action, s_player, cfg)
  state = _mob_phase(state, s_mob, cfg, plant_spawn, plant_pos)
  return _finish_tick(state, s_balance, cfg, balance)


def step_batch(states: State, actions: jax.Array,
               cfg: EnvConfig = DEFAULT_CONFIG,
               balance: bool | None = None,
               engine: str = 'auto') -> Tuple[State, StepOut]:
  """Batched tick over a leading env axis.

  ``engine``: 'jnp' vmaps :func:`step`; 'pallas' runs the mob phase as one
  fused TPU kernel (bit-identical results — same `_mob_core` trace);
  'auto' picks pallas on TPU backends.  Key handling matches :func:`step`
  exactly, so both engines produce identical trajectories.
  """
  if engine == 'auto':
    engine = 'pallas' if jax.default_backend() == 'tpu' else 'jnp'
  if engine == 'jnp':
    return jax.vmap(lambda s, a: step(s, a, cfg, balance))(states, actions)

  step_ = states.step + 1
  s_player, s_mob, s_balance = jax.vmap(_tick_seeds)(states.key, step_)
  states = states.replace(step=step_)
  states, plant_spawn, plant_pos = jax.vmap(
      lambda s, a, k: _player_phase(s, a, k, cfg))(
          states, actions, s_player)
  states = _mob_phase_pallas(states, s_mob, cfg, plant_spawn,
                             plant_pos)
  return jax.vmap(lambda s, k: _finish_tick(s, k, cfg, balance))(
      states, s_balance)


def _mob_phase_pallas(states: State, seeds, cfg: EnvConfig,
                      plant_spawn, plant_pos, block: int = 32) -> State:
  """The whole mob phase as ONE fused Pallas kernel, gridded over envs.

  The XLA path materializes ~100 (N, C) intermediate planes to HBM per
  tick; here every intermediate lives in VMEM and HBM sees exactly one
  read and one write of the five narrow channel planes per env.  The
  kernel body runs the same `_mob_core` trace as the jnp path, so results
  are bit-identical (tests/test_step.py::test_pallas_engine_matches_jnp).
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  w, h = cfg.area
  c = w * h
  raw = jax.vmap(lambda s, k, ps, pp: _mob_core_args(s, k, ps, pp, cfg,
                                                     widen=False))(
      states, seeds, plant_spawn, plant_pos)
  M, T, Hp, A, F, px, py, sleeping, seed, plant_idx = raw
  n = M.shape[0]
  pad = (-n) % block
  col = lambda s, dt: s.astype(dt).reshape(-1, 1)
  ins = [M, T, Hp, A, F, col(px, jnp.int32), col(py, jnp.int32),
         col(sleeping, jnp.int32), col(seed, jnp.int32),
         col(plant_idx, jnp.int32)]
  if pad:
    ins = [jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) for a in ins]
  np_ = n + pad

  def kernel(m_ref, t_ref, h_ref, a_ref, f_ref, px_ref, py_ref, sl_ref,
             seed_ref, pi_ref, om, ot, oh, oa, of_, od):
    cell = jax.lax.broadcasted_iota(jnp.int32, (block, c), 1)
    i32 = lambda r: r[...].astype(jnp.int32)
    outs = _mob_core(
        cell, i32(m_ref), i32(t_ref), i32(h_ref), i32(a_ref), i32(f_ref),
        px_ref[...], py_ref[...], sl_ref[...] != 0, seed_ref[...],
        pi_ref[...], cfg)
    mo, to, ho, ao, fo, dmg = outs
    om[...] = mo.astype(om.dtype)
    ot[...] = to.astype(ot.dtype)
    oh[...] = ho.astype(oh.dtype)
    oa[...] = ao.astype(oa.dtype)
    of_[...] = fo.astype(of_.dtype)
    od[...] = dmg

  plane = lambda dt: jax.ShapeDtypeStruct((np_, c), dt)
  spec_plane = pl.BlockSpec((block, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
  spec_col = pl.BlockSpec((block, 1), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
  outs = pl.pallas_call(
      kernel,
      grid=(np_ // block,),
      in_specs=[spec_plane] * 5 + [spec_col] * 5,
      out_specs=[spec_plane] * 5 + [spec_col],
      out_shape=[plane(M.dtype), plane(T.dtype), plane(Hp.dtype),
                 plane(A.dtype), plane(F.dtype),
                 jax.ShapeDtypeStruct((np_, 1), jnp.int32)],
      # ~80 live (block, C) int32 planes peak at ~20 MB for block=32; v5e
      # has 128 MB of VMEM, the default scoped limit is only 16 MB.
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=jax.default_backend() != 'tpu',  # CPU: test/debug mode
  )(*ins)
  outs = [o[:n] for o in outs]
  outs = [o.astype(jnp.int32) for o in outs[:5]] + [outs[5]]
  return jax.vmap(lambda s, *o: _mob_finish(s, o, cfg))(states, *outs)


def _finish_tick(state: State, k_balance: jax.Array, cfg: EnvConfig,
                 balance: bool | None) -> Tuple[State, StepOut]:
  """Chunk balancing + bookkeeping + reward/done (one env)."""
  w, h = cfg.area
  step_ = state.step

  def _no_balance(state, key):
    del key
    zero = jnp.zeros((w, h), bool)
    return zero, [zero] * len(BAL_CLASSES)

  if balance is False:
    despawn, spawns = _no_balance(state, k_balance)
  elif balance is True:
    despawn, spawns = _balance_phase(state, k_balance, cfg)
  else:
    despawn, spawns = jax.lax.cond(
        (step_ % cfg.balance_every) == 0,
        lambda s, k: _balance_phase(s, k, cfg), _no_balance,
        state, k_balance)
  state = _apply_balance(state, despawn, spawns, cfg)

  # Track chunks that held entities (the reference's defaultdict keys,
  # engine.py:36/:57/:78-79, consumed by env.py:90-95).
  touched = state.chunk_touched | _chunk_reduce(
      state.ent.etype > 0, cfg, False, jnp.any)

  # Reward and termination (env.py:97-107).
  hp = state.player.inventory[rules.ITEM_HEALTH]
  reward = (hp - state.env_last_health).astype(jnp.float32) / 10.0
  new_unlock = (state.player.achievements > 0) & ~state.unlocked
  reward = reward + jnp.where(new_unlock.any(), 1.0, 0.0)
  unlocked = state.unlocked | (state.player.achievements > 0)
  dead = hp <= 0
  # `self._length and self._step >= self._length` (env.py:106): a falsy
  # length disables the cap.
  over = (step_ >= cfg.length) if cfg.length else jnp.asarray(False)
  done = dead | over

  state = state.replace(env_last_health=hp, unlocked=unlocked,
                        chunk_touched=touched)
  return state, StepOut(reward=reward, done=done, dead=dead, ended=done)
