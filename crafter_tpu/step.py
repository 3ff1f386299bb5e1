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


def _dirvec(idx: jax.Array):
  """Direction index plane -> (dx, dy) component planes (rules.DIRS)."""
  dx = jnp.where(idx == 0, -1, jnp.where(idx == 1, 1, 0))
  dy = jnp.where(idx == 2, -1, jnp.where(idx == 3, 1, 0))
  return dx, dy


def _lane_iota(n: int, like: jax.Array) -> jax.Array:
  """int32 [0..n) along a fresh last axis with ``like``'s batch dims."""
  shape = like.shape[:-1] + (n,)
  return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _t1(idx: jax.Array, table, default: int = 0) -> jax.Array:
  """Static 1-D int table lookup by compare-select; OOB reads ``default``."""
  out = jnp.full(idx.shape, default, jnp.int32)
  for i, v in enumerate(np.asarray(table).tolist()):
    if v != default:
      out = jnp.where(idx == i, jnp.int32(v), out)
  return out


def _t1f(idx: jax.Array, table) -> jax.Array:
  """Static 1-D float table lookup by compare-select; OOB reads 0."""
  out = jnp.zeros(idx.shape, jnp.float32)
  for i, v in enumerate(np.asarray(table, np.float32).tolist()):
    if v != 0.0:
      out = jnp.where(idx == i, jnp.float32(v), out)
  return out


def _req_ok(idx: jax.Array, inv: jax.Array, table) -> jax.Array:
  """``all(inv >= table[idx])`` for a sparse static (rows, 16) cost table."""
  tb = np.asarray(table)
  ok = jnp.ones(idx.shape, bool)
  for r, j in zip(*np.nonzero(tb)):
    ok = ok & ((idx != int(r)) | (inv[..., int(j):int(j) + 1] >= int(tb[r, j])))
  return ok


def _row_add(idx: jax.Array, cond: jax.Array, inv: jax.Array, table,
             sign: int = 1) -> jax.Array:
  """``inv +/- where(cond, table[idx], 0)`` for a sparse static cost table."""
  tb = np.asarray(table)
  lane = _lane_iota(tb.shape[1], inv)
  for r, j in zip(*np.nonzero(tb)):
    delta = sign * int(tb[r, j])
    inv = jnp.where(cond & (idx == int(r)) & (lane == int(j)),
                    inv + delta, inv)
  return inv


def _ach_add(ach: jax.Array, idx: jax.Array, cond: jax.Array) -> jax.Array:
  """achievements[idx] += 1 where ``cond`` (one-hot compare, no scatter)."""
  lane = _lane_iota(rules.N_ACHIEVEMENTS, ach)
  return ach + ((lane == idx) & cond).astype(jnp.int32)


def _player_core(cell, M, T, Hp, A, action, facing, px, py, sleeping,
                 hunger, thirst, fatigue, recover, last_health, inv, ach,
                 seed, cfg: EnvConfig):
  """Pure re-derivation of Player.update (objects.py:99-131) on flat planes.

  Scalar decision logic over a handful of one-hot plane reads; all world
  writes are masked selects at the (single) target cell.  Returns the
  updated planes, the player record fields, and the pending plant-spawn
  cell index (-1 = none; applied after the mob phase so the fresh plant
  does not update this tick, matching the reference's copy-at-loop-start
  iteration, engine.py:41-44).
  """
  t = rules.TABLES
  w, h = cfg.area
  energy_max = int(t.item_max[rules.ITEM_ENERGY])
  lane16 = _lane_iota(rules.N_ITEMS, inv)

  def read_at(plane, idx):
    return jnp.sum(jnp.where(cell == idx, plane, 0), -1, keepdims=True)

  def item(j):
    return jnp.sum(jnp.where(lane16 == j, inv, 0), -1, keepdims=True)

  # Sleep state machine (objects.py:103-108): while asleep the action is
  # forced to `sleep`; on full energy the player wakes, unlocks wake_up, and
  # the original action executes.
  full = item(rules.ITEM_ENERGY) >= energy_max
  wake = sleeping & full
  action = jnp.where(sleeping & ~full, rules.A_SLEEP, action)
  sleeping = sleeping & ~wake
  ach = _ach_add(ach, jnp.full(action.shape, rules.ACH_ID['wake_up'],
                               jnp.int32), wake)

  # The do/place target uses the facing from *before* this tick's move
  # (objects.py:100 computes it at update start).
  fdx, fdy = _dirvec(facing)
  tx, ty = px + fdx, py + fdy
  tin = (tx >= 0) & (tx < w) & (ty >= 0) & (ty < h)
  t_idx = jnp.where(tin, tx * h + ty, -1)   # -1: no cell matches (OOB)
  move_dir_idx = jnp.clip(action - 1, 0, 3)
  mdx, mdy = _dirvec(move_dir_idx)
  mx, my = px + mdx, py + mdy
  min_ = (mx >= 0) & (mx < w) & (my >= 0) & (my < h)
  m_idx = jnp.where(min_, mx * h + my, -1)
  p_idx = px * h + py
  tmat = read_at(M, t_idx)       # 0 = out of bounds (MAT_NONE)
  mtmat = read_at(M, m_idx)
  heremat = read_at(M, p_idx)
  ttype = read_at(T, t_idx)
  thp = read_at(Hp, t_idx)
  taux = read_at(A, t_idx)
  t_occupied = ttype > 0
  mt_occupied = read_at(T, m_idx) > 0

  is_move = (1 <= action) & (action <= 4)
  is_do = action == rules.A_DO
  is_sleep = action == rules.A_SLEEP
  is_place = (7 <= action) & (action <= 10)
  is_make = (11 <= action) & (action <= 16)

  # --- move (objects.py:174-179): facing set even when blocked. ----------
  facing = jnp.where(is_move, move_dir_idx, facing)
  can_move = is_move & min_ & _mat_in(mtmat, t.walkable_player) & ~mt_occupied
  new_px = jnp.where(can_move, mx, px)
  new_py = jnp.where(can_move, my, py)
  new_idx = jnp.where(can_move, m_idx, p_idx)
  T = jnp.where((cell == p_idx) & can_move, 0, T)
  T = jnp.where((cell == new_idx) & can_move, rules.E_PLAYER, T)
  # Standing on lava after the move attempt is instant death
  # (objects.py:178-179) — checked at the post-move cell either way.
  on_lava = is_move & (jnp.where(can_move, mtmat, heremat)
                       == rules.MAT_LAVA)
  inv = jnp.where((lane16 == rules.ITEM_HEALTH) & on_lava, 0, inv)

  # --- do on an entity (objects.py:181-213). -----------------------------
  do_obj = is_do & t_occupied
  damage = jnp.maximum(jnp.maximum(
      jnp.full(action.shape, 1, jnp.int32),
      jnp.where(item(rules.ITEM_ID['wood_sword']) > 0, 2, 0)), jnp.maximum(
      jnp.where(item(rules.ITEM_ID['stone_sword']) > 0, 3, 0),
      jnp.where(item(rules.ITEM_ID['iron_sword']) > 0, 5, 0)))
  # Ripe plant: eat, reset growth, +4 food (objects.py:188-192).
  eat_plant = do_obj & (ttype == rules.E_PLANT) & (taux > 300)
  A = jnp.where((cell == t_idx) & eat_plant, 0, A)
  # Mobs take damage; health floors at 0 (objects.py:28-30 setter).
  hit_mob = do_obj & ((ttype == rules.E_ZOMBIE) | (ttype == rules.E_SKELETON)
                      | (ttype == rules.E_COW))
  hp_after = jnp.maximum(0, thp - damage)
  Hp = jnp.where((cell == t_idx) & hit_mob, hp_after, Hp)
  killed = hit_mob & (hp_after <= 0)
  eat_cow = killed & (ttype == rules.E_COW)
  food_gain = jnp.where(eat_plant, 4, 0) + jnp.where(eat_cow, 6, 0)
  inv = jnp.where(lane16 == rules.ITEM_FOOD, inv + food_gain, inv)
  ach = _ach_add(ach, jnp.full(action.shape, rules.ACH_ID['eat_plant'],
                               jnp.int32), eat_plant)
  ach = _ach_add(ach, jnp.full(action.shape, rules.ACH_ID['eat_cow'],
                               jnp.int32), eat_cow)
  ach = _ach_add(ach, jnp.full(action.shape, rules.ACH_ID['defeat_zombie'],
                               jnp.int32), killed & (ttype == rules.E_ZOMBIE))
  ach = _ach_add(ach, jnp.full(action.shape, rules.ACH_ID['defeat_skeleton'],
                               jnp.int32),
                 killed & (ttype == rules.E_SKELETON))

  # --- do on a material (objects.py:214-229). ----------------------------
  do_mat = is_do & ~t_occupied
  drink_water = do_mat & (tmat == rules.MAT_WATER)
  can_collect = (do_mat & _mat_in(tmat, t.collectible)
                 & _req_ok(tmat, inv, t.collect_require))
  # Leaves are applied before the probability draw (objects.py:225-226).
  M = jnp.where((cell == t_idx) & can_collect,
                _t1(tmat, t.collect_leaves), M)
  prob = _t1f(tmat, t.collect_prob)
  got = _seed_uniform(seed) <= prob
  receive = can_collect & got
  inv = _row_add(tmat, receive, inv, t.collect_receive)
  cach = _t1(tmat, t.collect_ach, default=-1)
  ach = _ach_add(ach, cach, receive & (cach >= 0))

  # --- sleep (objects.py:117-119). ---------------------------------------
  sleeping = sleeping | (is_sleep & (item(rules.ITEM_ENERGY) < energy_max))

  # --- place (objects.py:231-249). ---------------------------------------
  pidx = jnp.clip(action - 7, 0, 3)
  pw = np.asarray(t.place_where)
  where_ok = jnp.zeros(action.shape, bool)
  for r, m in zip(*np.nonzero(pw)):
    where_ok = where_ok | ((pidx == int(r)) & (tmat == int(m)))
  place_ok = (is_place & ~t_occupied & where_ok
              & _req_ok(pidx, inv, t.place_uses))
  inv = _row_add(pidx, place_ok, inv, t.place_uses, sign=-1)
  is_mat_tab = np.asarray(t.place_is_material)
  pick_mat = jnp.zeros(action.shape, bool)
  for r in np.flatnonzero(is_mat_tab):
    pick_mat = pick_mat | (pidx == int(r))
  place_mat = place_ok & pick_mat
  M = jnp.where((cell == t_idx) & place_mat,
                _t1(pidx, t.place_material), M)
  plant_spawn = place_ok & ~pick_mat
  ach = _ach_add(ach, _t1(pidx, t.place_ach, default=-1), place_ok)

  # --- make (objects.py:251-261): 3x3 nearby window with the numpy
  # empty-slice quirk at the x==0 / y==0 edges (engine.py:95-103).
  midx = jnp.clip(action - 11, 0, 5)
  x = cell // h
  y = cell - x * h
  window = ((jnp.abs(x - px) <= 1) & (jnp.abs(y - py) <= 1)
            & (px >= 1) & (py >= 1))
  # Only materials some recipe actually requires nearby matter (the rows of
  # make_nearby are zero elsewhere, so `nearby | ~make_nearby[midx]` is
  # vacuously true for every other material).
  mn = np.asarray(t.make_nearby)
  near = {}
  for m in np.flatnonzero(mn.any(0)):
    near[int(m)] = jnp.sum(
        jnp.where(window & (M == int(m)), 1, 0), -1, keepdims=True) > 0
  nearby_ok = jnp.zeros(action.shape, bool)
  for r in range(mn.shape[0]):
    row_ok = jnp.ones(action.shape, bool)
    for m in np.flatnonzero(mn[r]):
      row_ok = row_ok & near[int(m)]
    nearby_ok = nearby_ok | ((midx == int(r)) & row_ok)
  make_ok = is_make & nearby_ok & _req_ok(midx, inv, t.make_uses)
  inv = _row_add(midx, make_ok, inv, t.make_uses, sign=-1)
  gives = np.stack([np.asarray(t.make_gives_item),
                    np.asarray(t.make_gives_count)], -1)
  for r in range(gives.shape[0]):
    j, cnt = int(gives[r, 0]), int(gives[r, 1])
    inv = jnp.where(make_ok & (midx == r) & (lane16 == j), inv + cnt, inv)
  ach = _ach_add(ach, _t1(midx, t.make_ach, default=-1), make_ok)

  # --- life stats, in half units (objects.py:133-151). -------------------
  hunger = jnp.where(eat_cow, 0, hunger)          # objects.py:212
  thirst = jnp.where(drink_water, 0, thirst)      # objects.py:218
  hunger = hunger + jnp.where(sleeping, 1, 2)
  food_tick = hunger > 50
  hunger = jnp.where(food_tick, 0, hunger)
  inv = jnp.where((lane16 == rules.ITEM_FOOD) & food_tick, inv - 1, inv)
  thirst = thirst + jnp.where(sleeping, 1, 2)
  drink_tick = thirst > 40
  thirst = jnp.where(drink_tick, 0, thirst)
  inv = jnp.where((lane16 == rules.ITEM_DRINK) & drink_tick, inv - 1, inv)
  fatigue = jnp.where(sleeping, jnp.minimum(fatigue - 2, 0), fatigue + 2)
  gain_e = fatigue < -20
  lose_e = fatigue > 60
  fatigue = jnp.where(gain_e | lose_e, 0, fatigue)
  inv = jnp.where(lane16 == rules.ITEM_ENERGY,
                  inv + jnp.where(gain_e, 1, 0) + jnp.where(lose_e, -1, 0),
                  inv)

  # --- health regen/degen (objects.py:153-167). --------------------------
  necessities = ((item(rules.ITEM_FOOD) > 0) & (item(rules.ITEM_DRINK) > 0)
                 & ((item(rules.ITEM_ENERGY) > 0) | sleeping))
  recover = recover + jnp.where(
      necessities, jnp.where(sleeping, 4, 2), jnp.where(sleeping, -1, -2))
  regen = recover > 50
  degen = recover < -30
  recover = jnp.where(regen | degen, 0, recover)
  hp = jnp.maximum(0, item(rules.ITEM_HEALTH)
                   + jnp.where(regen, 1, 0) + jnp.where(degen, -1, 0))
  inv = jnp.where(lane16 == rules.ITEM_HEALTH, hp, inv)

  # --- clamp, then wake on hurt (objects.py:126-131, :169-172). ----------
  mx_tab = np.asarray(t.item_max)
  imax = jnp.full(inv.shape, int(mx_tab[0]), jnp.int32)
  for j in range(len(mx_tab)):
    if mx_tab[j] != mx_tab[0]:
      imax = jnp.where(lane16 == j, int(mx_tab[j]), imax)
  inv = jnp.clip(inv, 0, imax)
  hp = jnp.sum(jnp.where(lane16 == rules.ITEM_HEALTH, inv, 0), -1,
               keepdims=True)
  sleeping = sleeping & ~(hp < last_health)

  plant_idx = jnp.where(plant_spawn, t_idx, -1)
  return (M, T, Hp, A, new_px, new_py, facing, sleeping, hunger, thirst,
          fatigue, recover, hp, inv, ach, plant_idx)


def _player_phase(state: State, action: jax.Array, seed: jax.Array,
                  cfg: EnvConfig):
  """jnp backend: one env, flat (C,) planes through `_player_core`."""
  w, h = cfg.area
  c = w * h
  cell = jnp.arange(c, dtype=jnp.int32)
  flat = lambda m: m.astype(jnp.int32)          # planes are stored flat
  col = lambda v: jnp.asarray(v, jnp.int32).reshape(1)
  p = state.player
  (M, T, Hp, A, px, py, facing, sleeping, hunger, thirst, fatigue, recover,
   last_health, inv, ach, plant_idx) = _player_core(
      cell, flat(state.mat_map), flat(state.ent.etype),
      flat(state.ent.health), flat(state.ent.aux),
      col(action), col(p.facing), col(p.pos[0]), col(p.pos[1]),
      p.sleeping.reshape(1), col(p.hunger), col(p.thirst), col(p.fatigue),
      col(p.recover), col(p.last_health), p.inventory, p.achievements,
      col(seed), cfg)
  grid = lambda pl, ref: pl.astype(ref.dtype)
  player = Player(
      pos=jnp.concatenate([px, py]), facing=facing[0], inventory=inv,
      achievements=ach, sleeping=sleeping[0], hunger=hunger[0],
      thirst=thirst[0], fatigue=fatigue[0], recover=recover[0],
      last_health=last_health[0])
  state = state.replace(
      mat_map=grid(M, state.mat_map),
      ent=state.ent.replace(etype=grid(T, state.ent.etype),
                            health=grid(Hp, state.ent.health),
                            aux=grid(A, state.ent.aux)),
      player=player)
  plant_spawn = plant_idx[0] >= 0
  plant_pos = jnp.where(
      plant_spawn, jnp.stack([plant_idx[0] // h, plant_idx[0] % h]),
      jnp.full((2,), -1, jnp.int32))
  return state, plant_spawn, plant_pos


# ---------------------------------------------------------------------------
# Phase 2: mobs, arrows, plants (objects.py:264-411).
#
# The phase is written ONCE as a flat-plane core over the last axis
# (`_mob_core`), shared verbatim by two backends:
#   * jnp: per-env (C,) planes under vmap (CPU and the single-env path);
#   * pallas: (E, C) blocks inside the fused tick kernel, every
#     intermediate in VMEM (see `_tick_pallas`) — the XLA path materializes ~100
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

  # Per-cell randomness: TWO avalanche hashes cover every gate.  A cell is
  # at most one entity type, so mutually exclusive types can share a field
  # (the same 10 bits gate a cow's walk, a zombie's chase, and a skeleton's
  # retreat-axis draw); a skeleton — the busiest type — needs five fields
  # plus the shared 2-bit direction draw, 52 bits total.  The hash chain
  # (two fmix rounds, four int32 multiplies each) is the single most
  # expensive item in the kernel, so halving it from the round-2 four
  # matters.  A `u < p` compare on a 10-bit field equals the float gate up
  # to |dp| <= 2^-11 — far below anything the distribution tests (or the
  # 1M-step score reproduction) can resolve.
  hb0 = _cell_bits_plane(seed, 0, x, y)
  hb1 = _cell_bits_plane(seed, 1, x, y)
  F10 = jnp.int32(0x3FF)
  g0 = hb0 & F10            # cow walk | zombie chase | skeleton retreat-axis
  g1 = _srl(hb0, 10) & F10  # zombie long-axis | skeleton shoot
  g2 = _srl(hb0, 20) & F10  # skeleton approach
  dirbits = _srl(hb0, 30)   # random-walk direction (all types)
  g3 = hb1 & F10            # skeleton walk
  g4 = _srl(hb1, 10) & F10  # skeleton approach-axis
  P10 = lambda p: jnp.int32(round(p * 1024.0))

  # Shared subexpressions of the three `_toward` draws (zombie chase,
  # skeleton retreat, skeleton approach): offsets, magnitudes, axis compare
  # and signs are identical across calls — only the long_axis draw differs.
  offx, offy = px - x, py - y
  x_longer = jnp.abs(offx) > jnp.abs(offy)
  sgnx = jnp.where(offx > 0, 1, jnp.where(offx < 0, -1, 0))
  sgny = jnp.where(offy > 0, 1, jnp.where(offy < 0, -1, 0))

  def toward(long_axis):
    use_x = ((long_axis & x_longer) | (~long_axis & ~x_longer))
    return jnp.where(use_x, sgnx, 0), jnp.where(use_x, 0, sgny)

  pdist = jnp.abs(offx) + jnp.abs(offy)
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
  rdx, rdy = _dirvec(dirbits)
  # Cow: random walk with p=0.5 (objects.py:277-279).
  cow_wants = g0 < P10(0.5)
  # Zombie: chase within dist 8 with p=0.9 (long axis p=0.8), else random
  # walk (objects.py:297-301).
  chase = (pdist <= 8) & (g0 < P10(0.9))
  twx, twy = toward(g1 < P10(0.8))
  zx = jnp.where(chase, twx, rdx)
  zy = jnp.where(chase, twy, rdy)
  # Skeleton (objects.py:327-341): retreat at dist<=3; on a failed retreat
  # fall through the elif chain (shoot / approach / walk).
  retreat = pdist <= 3
  rwx, rwy = toward(g0 < P10(0.6))
  c_shoot = (pdist <= 5) & (g1 < P10(0.5))
  c_approach = (pdist <= 8) & (g2 < P10(0.3))
  c_walk = g3 < P10(0.2)
  awx, awy = toward(g4 < P10(0.6))
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
  moving = (mvx != 0) | (mvy != 0)  # a (0,0) `toward` never succeeds
  # Move direction as an index (valid only where `moving`); reused by the
  # target-attribute loop, the claim pack, and the success pulls.
  pdir = jnp.where(mvx == -1, 0, jnp.where(mvx == 1, 1,
                                           jnp.where(mvy == -1, 2, 3)))
  # Per-direction in-bounds planes: only one coordinate can leave the grid
  # along a unit step, so one compare each (also the push/pull masks).
  bound = (x >= 1, x <= w - 2, y >= 1, y <= h - 2)
  # Roll diet: material (bits 0-3) and occupancy (bit 4) travel in ONE
  # pulled plane per direction (8 rolls -> 4).
  q = M | (occ0.astype(jnp.int32) << 4)
  tmat = jnp.zeros_like(M)
  tocc = jnp.zeros_like(pending)
  inside_t = jnp.zeros_like(pending)
  for d in range(4):
    sel = moving & (pdir == d)
    qd = pull(q, d)
    tmat = jnp.where(sel, qd & 15, tmat)
    tocc = tocc | (sel & (qd >= 16))
    inside_t = inside_t | (sel & bound[d])
  # A cell "targeting itself" (zero move vector) reads its own attributes
  # in the reference; feasibility fails there via the occupancy check.
  tmat = jnp.where(moving, tmat, M)
  tocc = (moving & tocc) | (~moving & occ0)
  inside_t = inside_t | ~moving

  # --- arrow impacts (objects.py:373-384): hit / despawn / fly decisions
  # plus damage at the target cell, applied pre-move so it travels with a
  # mob that also moves this tick (the round-1 semantics).  Arrows destroy
  # tables/furnaces into path (objects.py:380-382); the masked select is
  # idempotent, so several arrows smashing one cell are fine.  Roll diet:
  # hit-damage (bit 0) and smash (bit 1) travel in ONE pushed plane per
  # direction (8 -> 4).  The whole section runs under a scalar branch:
  # arrows are rare, so most 32-env kernel blocks skip the rolls entirely
  # (the vmapped jnp path turns the cond into a select — same trace).
  arrow_live = is_arrow & active

  def _arrow_impact(_):
    a_hit = arrow_live & tocc
    a_block = arrow_live & ~a_hit & ~_mat_in(tmat, t.walkable_arrow)
    smash_src = a_block & ((tmat == rules.MAT_TABLE)
                           | (tmat == rules.MAT_FURNACE))
    fx = a_hit.astype(jnp.int32) | (smash_src.astype(jnp.int32) << 1)
    dmg = jnp.zeros_like(M)
    smash = jnp.zeros_like(pending)
    for d in range(4):
      fd = push(jnp.where(F == d, fx, 0), d)
      dmg = dmg + 2 * (fd & 1)
      smash = smash | (fd >= 2)
    return a_hit, a_block, dmg, smash

  def _no_arrows(_):  # kept for the future scf.if gate
    z = jnp.zeros_like(pending)
    return z, z, jnp.zeros_like(M), z

  # NOTE: a scalar lax.cond would let a 32-env kernel block skip the rolls
  # when it holds no arrow, but this Mosaic build cannot legalize scf.if
  # with results ("failed to legalize operation 'scf.if'"), so the section
  # runs straight-line.
  a_hit, a_block, dmg, smash = _arrow_impact(None)
  a_fly = arrow_live & ~a_hit & ~a_block
  player_dmg = read_at(dmg, px * h + py)
  Hp = jnp.maximum(0, Hp - jnp.where(T > rules.E_PLAYER, dmg, 0))
  M = jnp.where(smash, rules.MAT_PATH, M)

  wants = active & ~dying & (
      (is_cow & cow_wants) | is_zom | (is_skel & skel_wants) | a_fly)

  # --- movement feasibility ----------------------------------------------
  walk_ok = ((is_arrow & _mat_in(tmat, t.walkable_arrow))
             | (~is_arrow & _mat_in(tmat, t.walkable_mob)))
  feasible = inside_t & walk_ok & ~tocc
  valid = wants & feasible & moving

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
  pk = (T | (F << 3) | (Hp << 5) | ((A & 15) << 13) | (pdir << 17)
        | (valid.astype(jnp.int32) << 19))
  # Priority-select the winning packed word first, decode it ONCE (the
  # round-2 loop decoded all four candidate words: 3x the field
  # extractions for the same result).  Ties keep the direction-priority
  # order of the reference's claim scan: the first d whose claim lands
  # wins, and a won word is never overwritten (wwin == 0 guard).
  wwin = jnp.zeros_like(pk)
  for d in range(4):
    pd = push(pk, d)
    ok = (pd >= (1 << 19)) & ((_srl(pd, 17) & 3) == d)
    wwin = jnp.where(ok & (wwin == 0), pd, wwin)
  taken = wwin > 0
  T1 = jnp.where(taken, wwin & 7, T)
  F1 = jnp.where(taken, _srl(wwin, 3) & 3, F)
  H1 = jnp.where(taken, _srl(wwin, 5) & 255, Hp)
  A1 = jnp.where(taken, _srl(wwin, 13) & 15, A)
  wdir = _srl(wwin, 17) & 3
  success = jnp.zeros_like(pending)
  for d in range(4):
    success = success | (pull(taken & (wdir == d), d)
                         & valid & (pdir == d))
  # Vacated cells empty out; a claim target was empty pre-move (tocc), so
  # no cell is both a winner and a successful mover.
  T1 = jnp.where(success, 0, T1)

  # --- skeleton shooting decision (objects.py:330-351).  A dead skeleton
  # "moves" whenever the retreat cell is free (World.move no-ops on removed
  # objects but Object.move still reports success, engine.py:67-69).
  s_moved = ((dying & retreat & feasible)
             | (~dying & retreat & success))
  shoot = active & is_skel & ~s_moved & c_shoot & (reload == 0)
  shvx = jnp.where(x_longer, sgnx, 0)   # toward, long axis
  shvy = jnp.where(x_longer, 0, sgny)

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
  # Scalar-gated like the impact section: most blocks have no shooter.
  def _arrow_spawn(ops):
    T1, H1, A1, F1 = ops
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
    return T1, H1, A1, F1

  T1, H1, A1, F1 = _arrow_spawn((T1, H1, A1, F1))  # see scf.if note above

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
  flat = lambda m: m.astype(jnp.int32) if widen else m

  plant_idx = jnp.where(plant_spawn,
                        plant_pos[..., 0] * h + plant_pos[..., 1], -1)
  return (flat(state.mat_map), flat(state.ent.etype),
          flat(state.ent.health), flat(state.ent.aux),
          flat(state.ent.facing), state.player.pos[..., 0],
          state.player.pos[..., 1], state.player.sleeping, seed, plant_idx)


def _mob_finish(state: State, outs, cfg: EnvConfig) -> State:
  """Fold `_mob_core` outputs back into the state pytree (one env)."""
  M, T1, H1, A1, F1, player_dmg = outs
  grid = lambda p, ref: p.astype(ref.dtype)
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

  Two stages, each keeping the minor (lane) dimension at full width: rows
  first ((ncx*csx, H) -> (ncx, H), minor dim H), then columns on the tiny
  remainder.  A single (ncx, csx, ncy, csy) view would make every
  intermediate 12 lanes wide — a ~10x vector-unit waste per op that
  dominated the phase.  The partial last chunk (64 = 5*12 + 4) reduces
  separately instead of padding to ncx*csx: the pad materialized a fresh
  (N, 72, 64) plane per reduction, ~0.2 ms each at 4096 envs (``fill`` is
  kept for API compatibility; only the neutral element of ``op`` is ever
  passed).
  """
  del fill
  (csx, csy), (ncx, ncy) = cfg.chunk_size, cfg.n_chunks
  w, h = grid.shape
  wf, hf = w // csx * csx, h // csy * csy
  rows = op(grid[:wf].reshape(wf // csx, csx, h), axis=1)  # (full, h)
  if wf < w:
    rows = jnp.concatenate([rows, op(grid[wf:], axis=0)[None]], 0)
  cols = op(rows[:, :hf].reshape(ncx, hf // csy, csy), axis=2)
  if hf < h:
    cols = jnp.concatenate([cols, op(rows[:, hf:], axis=1)[:, None]], 1)
  return cols                                              # (ncx, ncy)


def _balance_apply(state: State, seed: jax.Array, cfg: EnvConfig,
                   occ=None) -> State:
  """Chunk balancing for one env via the backend-shared `_balance_core`
  (env.py:141-179 semantics; see the core's docstring).

  ``occ``: optional extra occupancy plane folded into chunk_touched
  before balancing (the group path's OR of intermediate ticks).
  """
  w, h = cfg.area
  (ncx, ncy) = cfg.n_chunks
  nch = ncx * ncy
  cell = jnp.arange(w * h, dtype=jnp.int32)
  onehot = jnp.asarray(_chunk_tables(cfg))
  i32 = lambda a: a.astype(jnp.int32)
  occp = (jnp.zeros((w * h,), jnp.int32) if occ is None
          else i32(occ).reshape(-1))
  light = state_lib.daylight(state.step, cfg.day_length).reshape(1)
  T1, Hp1, A1, tc1 = _balance_core(
      cell, i32(state.mat_map), i32(state.ent.etype),
      i32(state.ent.health), i32(state.ent.aux), occp,
      i32(state.chunk_touched.reshape(nch)), light.astype(jnp.float32),
      state.player.pos[..., 0].reshape(1),
      state.player.pos[..., 1].reshape(1), seed.reshape(1), onehot, cfg)
  ent = state.ent.replace(etype=T1.astype(state.ent.etype.dtype),
                          health=Hp1.astype(state.ent.health.dtype),
                          aux=A1.astype(state.ent.aux.dtype))
  return state.replace(ent=ent, chunk_touched=tc1.reshape(ncx, ncy) != 0)


def _chunk_tables(cfg: EnvConfig):
  """Static cell->chunk one-hot matrix for MXU chunk reductions.

  Returns ``onehot`` float32 (C, NCH): ``onehot[c, k]`` is 1 iff cell c
  lies in chunk k.
  """
  w, h = cfg.area
  (csx, csy), (ncx, ncy) = cfg.chunk_size, cfg.n_chunks
  xs, ys = np.divmod(np.arange(w * h), h)
  ch = (xs // csx) * ncy + ys // csy
  onehot = np.zeros((w * h, ncx * ncy), np.float32)
  onehot[np.arange(w * h), ch] = 1.0
  return onehot


def _balance_core(cell, M, T, Hp, A, occ, touched, light, px, py, seed,
                  onehot, cfg):
  """Chunk balancing (env.py:141-179) on flat cell planes — backend-shared.

  The single source of truth for the balance phase, shared by every
  backend (`_balance_apply` runs it per env for the jnp paths, the group
  path batches it through `_balance_pallas`), so results are bit-identical
  by construction.  Inside the Pallas kernel every intermediate lives in
  VMEM; the round-2 XLA phase materialized ~30 (N, W, H) intermediates to
  HBM (~3.3 ms per pass at 4096 envs, profiled).

  Two plane<->chunk primitives replace the reference's per-chunk Python
  loop (env.py:157-179):

  * chunk reductions (counts, occupancy) and the per-chunk value
    broadcasts ride the MXU as one-hot matmuls against the static
    (C, NCH) cell->chunk matrix — single-pass bf16 is exact because
    every value stays below 2^8 and the MXU accumulates in float32
    (the round-2 kernel ran these at Precision.HIGHEST, a multi-pass
    mode that made the balance launch ~4.5 ms);
  * the reference's "uniform random member of this chunk" picks run as
    ONE segmented prefix-count ladder over a packed member plane (see
    the pick section below) — exactly uniform, replacing round 3's six
    argmax ladders over random-score planes (~144 shifted-max ops and
    six per-cell hash evaluations; the argmax also leaned ~0.2% into
    score ties, which the prefix scheme has none of).

  ``touched``: (.., NCH) int32 0/1 chunk lanes.  ``occ``: int32 plane of
  extra occupancy to fold into touched before balancing (the group path's
  OR of intermediate ticks; zeros otherwise).  ``light``: (.., 1) float32.
  ``onehot``: the `_chunk_tables` matrix (a kernel input — Pallas cannot
  capture large constants).  Returns ``(T', Hp', A', touched')``.
  """
  w, h = cfg.area
  (csx, csy), (ncx, ncy) = cfg.chunk_size, cfg.n_chunks
  x = cell // h
  y = cell % h
  f32 = jnp.float32

  # NOTE on the exactness claims below: interpret mode (the CPU CI path)
  # computes jnp.dot in fp32, so a non-{0,1}/>=2^8 operand slipping in
  # would pass CPU CI and only diverge on real TPU (bf16 MXU inputs).
  # The TPU-mode lane (tests/test_tpu.py, run on hardware) asserts
  # kernel==jnp bit-identity and is the check that actually guards this.

  def csum(plane):                                    # (.., C) -> (.., NCH)
    # Exact at default (single-pass bf16) precision: operands are {0, 1}.
    return jnp.dot(plane.astype(f32), onehot)

  def bcast(lanes):                                   # (.., NCH) -> (.., C)
    # Exact for integer lane values < 2^8 (bf16 mantissa) times {0, 1}.
    return jnp.dot(lanes.astype(f32), onehot.T)

  touched = (touched != 0) | (csum(occ != 0) > 0)

  counts = [csum(T == e).astype(jnp.int32) for e in BAL_CLASSES]
  grass_n = csum(M == rules.MAT_GRASS).astype(jnp.int32)
  path_n = csum(M == rules.MAT_PATH).astype(jnp.int32)

  # Spawn/despawn targets and gate draws: the same arithmetic (and the
  # same counter-hash stream) as `_balance_phase`, on (.., NCH) lanes.
  zero = jnp.zeros_like(light)
  tmin = [jnp.where(grass_n < 50, zero, 3.5 - 3 * light),
          jnp.where(path_n < 6, zero, zero + 1.0),
          jnp.where(grass_n < 30, zero, zero + 1.0)]
  tmax = [zero + (3.5 - 3 * light), zero + 2.0, zero + (1.5 + light)]
  gl = _lane_iota(ncx * ncy, touched.astype(jnp.int32))

  def gate(i, side):
    v = seed + _i32c(0x27D4EB2F) * (gl * 6 + (i * 2 + side + 1))
    return _srl(_fmix(_fmix(v)), 8).astype(f32) * (1.0 / (1 << 24))

  want_spawn, want_despawn = [], []
  for i in range(len(BAL_CLASSES)):
    ws = (touched & (counts[i] < tmin[i].astype(jnp.int32))
          & (gate(i, 0) < BAL_SPAWN_P[i]))
    want_spawn.append(ws)
    want_despawn.append(
        touched & ~ws & (counts[i] > tmax[i].astype(jnp.int32))
        & (gate(i, 1) < BAL_DESPAWN_P[i]))

  # All six per-chunk want bits ride to the cell domain in ONE broadcast
  # (packed values <= 63, exact in bf16) instead of one matmul per pick.
  # Growing BAL_CLASSES would push packed values past bf16's 8-bit-integer
  # exactness and silently corrupt the broadcast at default precision.
  assert 2 * len(BAL_CLASSES) <= 8, 'wantbits packing exceeds bf16 exactness'
  wantbits = jnp.zeros_like(touched, jnp.int32)
  for i in range(len(BAL_CLASSES)):
    wantbits = (wantbits | want_despawn[i].astype(jnp.int32) << i
                | want_spawn[i].astype(jnp.int32) << (3 + i))
  wantcell = bcast(wantbits).astype(jnp.int32)

  # --- uniform member picks via segmented prefix counts ------------------
  # The reference picks a uniform random member (creature / material cell)
  # per gated chunk (env.py:157-179).  Instead of per-class argmaxes over
  # random score planes (round 3: 6 x 24 shifted-max/broadcast ladders),
  # enumerate each chunk's members in lane order with ONE segmented
  # prefix-count ladder over a packed plane — the winner is the member
  # whose 0-based in-chunk index equals a per-chunk uniform draw
  # r = floor(u * count): exactly uniform (the old 24-bit argmax leaned
  # ~0.2% into ties; this has no ties at all).
  #
  # Five member fields (despawn: per-class creatures; spawn: grass/path
  # cells — zombie and cow SHARE the grass field: picks over the same
  # member set from independent r draws are independent uniforms, exactly
  # like two reference draws).  Fields are 8 bits; prefix counts are
  # bounded by the chunk cell count, asserted below.
  assert csx * csy <= 255, 'prefix-count fields overflow 8 bits'
  mem = [T == e for e in BAL_CLASSES]
  mem.append(M == rules.MAT_GRASS)
  mem.append(M == rules.MAT_PATH)
  SPAWN_MEM = (3, 4, 3)  # zombie->grass, skeleton->path, cow->grass
  counts = counts + [grass_n, path_n]

  ox, oy = x % csx, y % csy
  # Bottom in-chunk y-offset (partial last chunk shrinks it).
  bot = jnp.minimum(csy - 1, (h - 1) - (y - oy))

  def chunk_prefix(pm):
    """Inclusive in-chunk member count up to each cell, in (x, y) lane
    order, all packed fields at once (adds never cross 8-bit fields).

    Three select/add ladders: y-scan within chunk columns, bottom-value
    broadcast up each column (copy-based, packed-safe), then an
    exclusive column scan along x.
    """
    iy = pm
    for s in (1, 2, 4, 8):                  # inclusive y-scan
      iy = iy + jnp.where(oy >= s, jnp.roll(iy, s, axis=-1), 0)
    tot = iy
    for s in (1, 2, 4, 8):                  # column total to every cell
      tot = jnp.where(oy + s <= bot, jnp.roll(tot, -s, axis=-1), tot)
    ex = jnp.where(ox >= 1, jnp.roll(tot, h, axis=-1), 0)
    for s in (1, 2, 4, 8):                  # exclusive x-scan of totals
      ex = ex + jnp.where(ox >= s, jnp.roll(ex, s * h, axis=-1), 0)
    return ex + iy

  pmA = (mem[0].astype(jnp.int32) | mem[1].astype(jnp.int32) << 8
         | mem[2].astype(jnp.int32) << 16 | mem[3].astype(jnp.int32) << 24)
  prefA = chunk_prefix(pmA)
  prefB = chunk_prefix(mem[4].astype(jnp.int32))
  pref = [prefA & 255, _srl(prefA, 8) & 255, _srl(prefA, 16) & 255,
          _srl(prefA, 24), prefB]

  # Per-chunk uniform indices r = min(floor(u * count), count - 1); empty
  # chunks yield -1 (matches nothing).  Stream: same counter-hash family
  # as the gates, disjoint multiplier indices (gates use 1..6*NCH).
  def rdraw(j, cnt):
    v = seed + _i32c(0x27D4EB2F) * (6 * ncx * ncy + 1 + gl * 6 + j)
    u = _srl(_fmix(_fmix(v)), 8).astype(f32) * (1.0 / (1 << 24))
    return jnp.minimum(jnp.floor(u * cnt.astype(f32)), cnt - 1)

  # r values stay < 256 so the per-pick broadcast matmul is exact in bf16.
  rcell = [bcast(rdraw(j, counts[m])).astype(jnp.int32)
           for j, m in enumerate(list(range(3)) + list(SPAWN_MEM))]

  def pick(i, memplane, prefplane, rplane, wbit):
    return (memplane & (prefplane - 1 == rplane)
            & ((_srl(wantcell, wbit) & 1) > 0))

  pdist = jnp.abs(x - px) + jnp.abs(y - py)
  despawn = jnp.zeros(cell.shape, bool)
  for i, etype in enumerate(BAL_CLASSES):
    despawn = despawn | (pick(i, mem[i], pref[i], rcell[i], i)
                         & (pdist >= BAL_DESPAN[i]))
  T1 = jnp.where(despawn & (T > rules.E_PLAYER), 0, T)
  Hp1, A1 = Hp, A
  for i, etype in enumerate(BAL_CLASSES):
    m = SPAWN_MEM[i]
    ok = (pick(3 + i, mem[m], pref[m], rcell[3 + i], 3 + i)
          & (pdist >= BAL_SPAN[i]) & (T1 == 0))
    T1 = jnp.where(ok, etype, T1)
    Hp1 = jnp.where(ok, TYPE_HEALTH[etype], Hp1)
    A1 = jnp.where(ok, 0, A1)

  touched = touched | (csum(T1 > 0) > 0)
  return T1, Hp1, A1, touched.astype(jnp.int32)


def _balance_pallas(states: State, seeds: jax.Array, occ_pre: jax.Array,
                    cfg: EnvConfig, block: int = 32) -> State:
  """Batched group-end balance as ONE Pallas kernel (see `_balance_core`).

  The TPU twin of ``vmap(balance_group_finish)``: bit-identical results
  (TestGroupKernel asserts the whole group path leaf-for-leaf against the
  sequential jnp path).  ``occ_pre``: (N, C) occupancy OR of the group's
  intermediate ticks.
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  w, h = cfg.area
  (ncx, ncy) = cfg.n_chunks
  nch = ncx * ncy
  c = w * h
  n = states.step.shape[0]
  col = lambda s: jnp.asarray(s).astype(jnp.int32).reshape(-1, 1)
  light = state_lib.daylight(states.step, cfg.day_length).reshape(-1, 1)
  ins = [states.mat_map, states.ent.etype, states.ent.health,
         states.ent.aux, occ_pre,
         states.chunk_touched.reshape(n, nch).astype(jnp.int32),
         light.astype(jnp.float32),
         col(states.player.pos[..., 0]), col(states.player.pos[..., 1]),
         col(seeds)]
  pad = (-n) % block
  if pad:
    ins = [jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) for a in ins]
  np_ = n + pad
  onehot = jnp.asarray(_chunk_tables(cfg))

  def kernel(m_ref, t_ref, h_ref, a_ref, occ_ref, tc_ref, li_ref, px_ref,
             py_ref, sd_ref, oh_ref, ot, oh, oa, otc):
    cell = jax.lax.broadcasted_iota(jnp.int32, (block, c), 1)
    i32 = lambda r: r[...].astype(jnp.int32)
    T1, H1, A1, tc1 = _balance_core(
        cell, i32(m_ref), i32(t_ref), i32(h_ref), i32(a_ref), i32(occ_ref),
        tc_ref[...], li_ref[...], px_ref[...], py_ref[...], sd_ref[...],
        oh_ref[...], cfg)
    ot[...] = T1.astype(ot.dtype)
    oh[...] = H1.astype(oh.dtype)
    oa[...] = A1.astype(oa.dtype)
    otc[...] = tc1

  plane = lambda dt: jax.ShapeDtypeStruct((np_, c), dt)
  spec = lambda width: pl.BlockSpec((block, width), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
  # The chunk tables are shared by every block (index map pins them).
  tspec = pl.BlockSpec((c, nch), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
  outs = pl.pallas_call(
      kernel,
      grid=(np_ // block,),
      in_specs=([spec(c)] * 5 + [spec(nch)] + [spec(1)] * 4 + [tspec]),
      out_specs=[spec(c)] * 3 + [spec(nch)],
      out_shape=[plane(states.ent.etype.dtype),
                 plane(states.ent.health.dtype),
                 plane(states.ent.aux.dtype),
                 jax.ShapeDtypeStruct((np_, nch), jnp.int32)],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=jax.default_backend() != 'tpu',  # CPU: test/debug mode
  )(*ins, onehot)
  T1, H1, A1, tc1 = (o[:n] for o in outs)
  return states.replace(
      ent=states.ent.replace(etype=T1, health=H1, aux=A1),
      chunk_touched=tc1.reshape(n, ncx, ncy) != 0)


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
  states = _tick_pallas(states, actions, s_player, s_mob, cfg)
  return jax.vmap(lambda s, k: _finish_tick(s, k, cfg, balance))(
      states, s_balance)


def _tick_pallas(states: State, actions, s_player, s_mob,
                 cfg: EnvConfig, block: int = 32) -> State:
  """Player phase + mob phase as ONE fused Pallas kernel, gridded over envs.

  The XLA path materializes ~100 (N, C) intermediate planes to HBM per
  tick (plus layout copies at every phase boundary); here every
  intermediate lives in VMEM and HBM sees exactly one read and one write
  of the five narrow channel planes per env.  The kernel body runs the
  same `_player_core` + `_mob_core` traces as the jnp path, so results are
  bit-identical (tests/test_step.py::test_pallas_engine_matches_jnp).
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  w, h = cfg.area
  c = w * h
  n = actions.shape[0]
  p = states.player
  col = lambda s: jnp.asarray(s).astype(jnp.int32).reshape(-1, 1)
  ins = [states.mat_map, states.ent.etype,
         states.ent.health, states.ent.aux,
         states.ent.facing,
         col(actions), col(p.facing), col(p.pos[..., 0]),
         col(p.pos[..., 1]), col(p.sleeping), col(p.hunger), col(p.thirst),
         col(p.fatigue), col(p.recover), col(p.last_health),
         col(s_player), col(s_mob),
         p.inventory.astype(jnp.int32), p.achievements.astype(jnp.int32)]
  pad = (-n) % block
  if pad:
    ins = [jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) for a in ins]
  np_ = n + pad

  def kernel(m_ref, t_ref, h_ref, a_ref, f_ref, act_ref, fac_ref, px_ref,
             py_ref, sl_ref, hu_ref, th_ref, fa_ref, re_ref, lh_ref,
             sp_ref, sm_ref, inv_ref, ach_ref,
             om, ot, oh, oa, of_, opx, opy, ofac, osl, ohu, oth, ofa, ore,
             olh, oinv, oach):
    cell = jax.lax.broadcasted_iota(jnp.int32, (block, c), 1)
    i32 = lambda r: r[...].astype(jnp.int32)
    (M, T, Hp, A, px2, py2, fac2, slp2, hu2, th2, fa2, re2, lh2, inv2,
     ach2, plant_idx) = _player_core(
        cell, i32(m_ref), i32(t_ref), i32(h_ref), i32(a_ref),
        act_ref[...], fac_ref[...], px_ref[...], py_ref[...],
        sl_ref[...] != 0, hu_ref[...], th_ref[...], fa_ref[...],
        re_ref[...], lh_ref[...], inv_ref[...], ach_ref[...],
        sp_ref[...], cfg)
    Mo, To, Ho, Ao, Fo, dmg = _mob_core(
        cell, M, T, Hp, A, i32(f_ref), px2, py2, slp2, sm_ref[...],
        plant_idx, cfg)
    # Mob damage lands on the player's health channel (objects.py:302-312);
    # the jnp path applies the identical update in `_mob_finish`.
    lane16 = _lane_iota(rules.N_ITEMS, inv2)
    inv2 = jnp.where(lane16 == rules.ITEM_HEALTH,
                     jnp.maximum(0, inv2 - dmg), inv2)
    om[...] = Mo.astype(om.dtype)
    ot[...] = To.astype(ot.dtype)
    oh[...] = Ho.astype(oh.dtype)
    oa[...] = Ao.astype(oa.dtype)
    of_[...] = Fo.astype(of_.dtype)
    opx[...] = px2
    opy[...] = py2
    ofac[...] = fac2
    osl[...] = slp2.astype(jnp.int32)
    ohu[...] = hu2
    oth[...] = th2
    ofa[...] = fa2
    ore[...] = re2
    olh[...] = lh2
    oinv[...] = inv2
    oach[...] = ach2

  plane = lambda dt: jax.ShapeDtypeStruct((np_, c), dt)
  colsd = jax.ShapeDtypeStruct((np_, 1), jnp.int32)
  spec = lambda width: pl.BlockSpec((block, width), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
  outs = pl.pallas_call(
      kernel,
      grid=(np_ // block,),
      in_specs=[spec(c)] * 5 + [spec(1)] * 12 + [spec(rules.N_ITEMS),
                                                 spec(rules.N_ACHIEVEMENTS)],
      out_specs=[spec(c)] * 5 + [spec(1)] * 9 + [spec(rules.N_ITEMS),
                                                 spec(rules.N_ACHIEVEMENTS)],
      out_shape=([plane(states.mat_map.dtype), plane(states.ent.etype.dtype),
                  plane(states.ent.health.dtype), plane(states.ent.aux.dtype),
                  plane(states.ent.facing.dtype)]
                 + [colsd] * 9
                 + [jax.ShapeDtypeStruct((np_, rules.N_ITEMS), jnp.int32),
                    jax.ShapeDtypeStruct((np_, rules.N_ACHIEVEMENTS),
                                         jnp.int32)]),
      # ~100 live (block, C) int32 planes peak well under the v5e's 128 MB
      # of VMEM at block=32; the default scoped limit is only 16 MB.
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=jax.default_backend() != 'tpu',  # CPU: test/debug mode
  )(*ins)
  outs = [o[:n] for o in outs]
  (Mo, To, Ho, Ao, Fo, px2, py2, fac2, slp2, hu2, th2, fa2, re2, lh2,
   inv2, ach2) = outs
  grid = lambda pl_, ref: pl_.astype(ref.dtype)
  player = Player(
      pos=jnp.concatenate([px2, py2], -1), facing=fac2[:, 0],
      inventory=inv2, achievements=ach2, sleeping=slp2[:, 0] != 0,
      hunger=hu2[:, 0], thirst=th2[:, 0], fatigue=fa2[:, 0],
      recover=re2[:, 0], last_health=lh2[:, 0])
  return states.replace(
      mat_map=grid(Mo, states.mat_map),
      ent=EntMaps(etype=grid(To, states.ent.etype),
                  health=grid(Ho, states.ent.health),
                  aux=grid(Ao, states.ent.aux),
                  facing=grid(Fo, states.ent.facing)),
      player=player)


@struct.dataclass
class GroupSnaps:
  """Per-tick render snapshots from :func:`step_group_batch` for ticks
  0..K-2 (the group's last tick is rendered from the post-balance,
  post-reset state by the caller).  Everything the renderer reads is
  compressed to one uint8 plane per tick — material id (4 bits) | cell
  sprite id (4 bits, the render.pack_cells encoding) — plus player
  scalar columns.  Leaves are tick-major so the downstream flatten to
  (K-1)*N frame rows is a free reshape (the previous (N, K-1, C)
  transpose cost ~6 ms/group at 4096 envs).
  """

  packed: jax.Array   # (K, N, C) uint8 packed mid | ctex<<4 per cell;
  #                       row K-1 is UNWRITTEN (the caller renders the
  #                       group's last frame from the post-reset state and
  #                       fills that row in place, avoiding a 190 MB/group
  #                       concat at 4096 envs)
  px: jax.Array       # ((K-1), N, 1) int32 player x
  py: jax.Array       # ((K-1), N, 1) int32 player y
  facing: jax.Array   # ((K-1), N, 1) int32 player facing
  sleeping: jax.Array  # ((K-1), N, 1) int32 0/1
  inv: jax.Array      # ((K-1), N, 16) int32 inventory rows per tick


def step_group_batch(states: State, actions: jax.Array, cfg: EnvConfig,
                     block: int = 32, snapshots: bool = False):
  """K ticks as ONE fused Pallas kernel — planes stay VMEM-resident.

  The per-tick kernel (:func:`_tick_pallas`) still pays, per tick, one HBM
  round-trip of the five channel planes plus the XLA glue between launches
  (pads, narrowing casts, the balance/reset plumbing).  Stepping a whole
  balance-cadence group (K = cfg.balance_every) inside one kernel removes
  all of it: HBM sees one read and one write of the planes per K ticks,
  and reward/done/unlocked bookkeeping (the non-balance part of
  :func:`_finish_tick`) runs on in-register lane vectors.

  Balance and auto-reset are group-boundary events for this path — exactly
  the semantics of K :func:`crafter_tpu.env.vec_step` calls with
  ``reset_every=K, balance=(i == K-1)`` (the caller,
  :func:`crafter_tpu.env.vec_step_group`, finishes the group with
  :func:`balance_group_finish` and one reset pass; equality is asserted
  leaf-for-leaf in tests/test_step.py).

  ``actions``: (K, N) int32.  Returns ``(states, raw, occ_pre)`` where
  ``raw`` is a StepOut with (K, N) leaves of *unlatched* per-tick results
  and ``occ_pre`` is the (N, C) OR of post-tick occupancy over ticks
  1..K-1 (what the group-end balance's chunk_touched must see).

  ``snapshots``: additionally emit per-tick render snapshots
  (:class:`GroupSnaps`, appended to the return tuple) for ticks 0..K-2 —
  the fused pixel path (BASELINE config 3): the reference renders an
  observation every step (env.py:96, :120-133), and emitting the packed
  channels from VMEM costs ~2 bytes/cell/tick of HBM writes instead of
  falling back to per-tick kernel launches.
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  w, h = cfg.area
  c = w * h
  k, n = actions.shape
  p = states.player
  col = lambda s: jnp.asarray(s).astype(jnp.int32).reshape(-1, 1)
  kd = jax.lax.bitcast_convert_type(
      jax.random.key_data(states.key), jnp.int32)
  ins = [states.mat_map, states.ent.etype,
         states.ent.health, states.ent.aux,
         states.ent.facing,
         actions.T.astype(jnp.int32),
         col(p.facing), col(p.pos[..., 0]), col(p.pos[..., 1]),
         col(p.sleeping), col(p.hunger), col(p.thirst),
         col(p.fatigue), col(p.recover), col(p.last_health),
         col(states.step), col(states.env_last_health),
         col(kd[..., 0]), col(kd[..., 1]),
         p.inventory.astype(jnp.int32), p.achievements.astype(jnp.int32),
         states.unlocked.astype(jnp.int32)]
  pad = (-n) % block
  if pad:
    ins = [jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) for a in ins]
  np_ = n + pad

  def kernel(m_ref, t_ref, h_ref, a_ref, f_ref, act_ref, fac_ref, px_ref,
             py_ref, sl_ref, hu_ref, th_ref, fa_ref, re_ref, lh_ref,
             st_ref, elh_ref, k0_ref, k1_ref, inv_ref, ach_ref, unl_ref,
             om, ot, oh, oa, of_, oocc, opx, opy, ofac, osl, ohu, oth,
             ofa, ore, olh, oelh, oinv, oach, ounl, orew, odone, odead,
             *snap_refs):
    cell = jax.lax.broadcasted_iota(jnp.int32, (block, c), 1)
    i32 = lambda r: r[...].astype(jnp.int32)
    M, T, Hp, A, F = i32(m_ref), i32(t_ref), i32(h_ref), i32(a_ref), \
        i32(f_ref)
    fac, px, py = fac_ref[...], px_ref[...], py_ref[...]
    slp = sl_ref[...] != 0
    hu, th, fa, re, lh = (hu_ref[...], th_ref[...], fa_ref[...],
                          re_ref[...], lh_ref[...])
    elh = elh_ref[...]
    inv, ach, unl = inv_ref[...], ach_ref[...], unl_ref[...] != 0
    k0, k1 = k0_ref[...], k1_ref[...]
    acts = act_ref[...]
    occ = jnp.zeros((block, c), jnp.int32)
    lane16 = _lane_iota(rules.N_ITEMS, inv)
    length = int(cfg.length) if cfg.length else 0

    for t in range(k):
      step_t = st_ref[...] + (t + 1)
      # _tick_seeds, on (block, 1) lane columns.
      base = _fmix(k0 ^ _fmix(k1 + step_t * _i32c(0x9E3779B9)))
      s_mob = _fmix(base + _i32c(0x85EBCA6B))
      (M, T, Hp, A, px, py, fac, slp, hu, th, fa, re, lh, inv, ach,
       plant_idx) = _player_core(
          cell, M, T, Hp, A, acts[:, t:t + 1], fac, px, py, slp, hu, th,
          fa, re, lh, inv, ach, base, cfg)
      M, T, Hp, A, F, dmg = _mob_core(
          cell, M, T, Hp, A, F, px, py, slp, s_mob, plant_idx, cfg)
      inv = jnp.where(lane16 == rules.ITEM_HEALTH,
                      jnp.maximum(0, inv - dmg), inv)
      # Reward / done (the non-balance part of _finish_tick).
      hp = jnp.sum(jnp.where(lane16 == rules.ITEM_HEALTH, inv, 0), -1,
                   keepdims=True)
      new_unlock = jnp.sum(((ach > 0) & ~unl).astype(jnp.int32), -1,
                           keepdims=True) > 0
      reward = ((hp - elh).astype(jnp.float32) / 10.0
                + jnp.where(new_unlock, 1.0, 0.0))
      unl = unl | (ach > 0)
      elh = hp
      dead = hp <= 0
      done = dead | (step_t >= length) if length else dead
      orew[:, t:t + 1] = reward
      odone[:, t:t + 1] = done.astype(jnp.int32)
      odead[:, t:t + 1] = dead.astype(jnp.int32)
      if snapshots and t < k - 1:
        # Everything the renderer reads, packed to one uint8 plane +
        # scalar columns: material id | cell sprite id (ctex, the
        # render.pack_cells encoding; ripe stands in for aux — the
        # renderer only tests aux > 300 on plants).
        osnap, opxs, opys, ofacs, osls, oinvs = snap_refs
        ripe = ((T == rules.E_PLANT) & (A > 300)).astype(jnp.int32)
        ctex = jnp.where(
            T == rules.E_PLAYER, 1,
            jnp.where(T == rules.E_COW, 6,
                      jnp.where(T == rules.E_ZOMBIE, 7,
                                jnp.where(T == rules.E_SKELETON, 8,
                                          jnp.where(T == rules.E_ARROW,
                                                    9 + F,
                                                    jnp.where(
                                                        T == rules.E_PLANT,
                                                        13 + ripe, 0))))))
        osnap[t] = (M | (ctex << 4)).astype(osnap.dtype)
        opxs[t] = px
        opys[t] = py
        ofacs[t] = fac
        osls[t] = slp.astype(jnp.int32)
        oinvs[t] = inv
      if t < k - 1:
        occ = occ | T   # etype != 0 <=> occupied; OR keeps it cheap

    om[...] = M.astype(om.dtype)
    ot[...] = T.astype(ot.dtype)
    oh[...] = Hp.astype(oh.dtype)
    oa[...] = A.astype(oa.dtype)
    of_[...] = F.astype(of_.dtype)
    oocc[...] = (occ != 0).astype(oocc.dtype)
    opx[...], opy[...], ofac[...] = px, py, fac
    osl[...] = slp.astype(jnp.int32)
    ohu[...], oth[...], ofa[...], ore[...], olh[...] = hu, th, fa, re, lh
    oelh[...] = elh
    oinv[...] = inv
    oach[...] = ach
    ounl[...] = unl.astype(jnp.int32)

  plane = lambda dt: jax.ShapeDtypeStruct((np_, c), dt)
  colsd = jax.ShapeDtypeStruct((np_, 1), jnp.int32)
  lanes = lambda m, dt=jnp.int32: jax.ShapeDtypeStruct((np_, m), dt)
  spec = lambda width: pl.BlockSpec((block, width), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
  snap_specs, snap_shapes = [], []
  if snapshots:
    assert k >= 2, 'snapshots need at least a 2-tick group'
    ni = rules.N_ITEMS
    # Tick-major 3-D outputs: block (K-1, block, width), so the flatten
    # to (K-1)*N rows downstream is a free reshape.
    spec3 = lambda rows, width: pl.BlockSpec((rows, block, width),
                                             lambda i: (0, i, 0),
                                             memory_space=pltpu.VMEM)
    sd3 = lambda rows, width, dt: jax.ShapeDtypeStruct((rows, np_, width),
                                                       dt)
    snap_specs = [spec3(k, c)] + [spec3(k - 1, 1)] * 4 + [spec3(k - 1, ni)]
    snap_shapes = ([sd3(k, c, jnp.uint8)] + [sd3(k - 1, 1, jnp.int32)] * 4
                   + [sd3(k - 1, ni, jnp.int32)])
  outs = pl.pallas_call(
      kernel,
      grid=(np_ // block,),
      in_specs=([spec(c)] * 5 + [spec(k)] + [spec(1)] * 13
                + [spec(rules.N_ITEMS), spec(rules.N_ACHIEVEMENTS),
                   spec(rules.N_ACHIEVEMENTS)]),
      out_specs=([spec(c)] * 6 + [spec(1)] * 10
                 + [spec(rules.N_ITEMS), spec(rules.N_ACHIEVEMENTS),
                    spec(rules.N_ACHIEVEMENTS)] + [spec(k)] * 3
                 + snap_specs),
      out_shape=([plane(states.mat_map.dtype), plane(states.ent.etype.dtype),
                  plane(states.ent.health.dtype),
                  plane(states.ent.aux.dtype),
                  plane(states.ent.facing.dtype), plane(jnp.uint8)]
                 + [colsd] * 10
                 + [lanes(rules.N_ITEMS), lanes(rules.N_ACHIEVEMENTS),
                    lanes(rules.N_ACHIEVEMENTS)]
                 + [lanes(k, jnp.float32), lanes(k), lanes(k)]
                 + snap_shapes),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=jax.default_backend() != 'tpu',  # CPU: test/debug mode
  )(*ins)
  outs = ([o[:n] for o in outs[:22]]          # env-major outputs
          + [o[:, :n] for o in outs[22:]])    # tick-major snapshot outputs
  (Mo, To, Ho, Ao, Fo, occ_pre, px2, py2, fac2, slp2, hu2, th2, fa2, re2,
   lh2, elh2, inv2, ach2, unl2, rew, done, dead) = outs[:22]
  player = Player(
      pos=jnp.concatenate([px2, py2], -1), facing=fac2[:, 0],
      inventory=inv2, achievements=ach2, sleeping=slp2[:, 0] != 0,
      hunger=hu2[:, 0], thirst=th2[:, 0], fatigue=fa2[:, 0],
      recover=re2[:, 0], last_health=lh2[:, 0])
  states = states.replace(
      mat_map=Mo, ent=EntMaps(etype=To, health=Ho, aux=Ao, facing=Fo),
      player=player, step=states.step + k,
      env_last_health=elh2[:, 0], unlocked=unl2 != 0)
  raw = StepOut(reward=rew.T, done=done.T != 0, dead=dead.T != 0,
                ended=done.T != 0)
  if snapshots:
    snaps = GroupSnaps(packed=outs[22], px=outs[23], py=outs[24],
                       facing=outs[25], sleeping=outs[26], inv=outs[27])
    return states, raw, occ_pre, snaps
  return states, raw, occ_pre


def balance_group_finish(state: State, k_balance: jax.Array,
                         occ_pre: jax.Array, cfg: EnvConfig) -> State:
  """Group-end chunk balancing for :func:`step_group_batch` (one env).

  Replays the last tick's :func:`_finish_tick` balance exactly: the
  balance phase must see chunk_touched as of tick K-1 (accumulated from
  the group's intermediate occupancy, ``occ_pre``), and the final touched
  update includes the post-balance spawns (env.py:90-95 + the defaultdict
  growth on add/move, engine.py:36,:57,:78-79).
  """
  return _balance_apply(state, k_balance, cfg, occ=occ_pre)


def _finish_tick(state: State, k_balance: jax.Array, cfg: EnvConfig,
                 balance: bool | None) -> Tuple[State, StepOut]:
  """Chunk balancing + bookkeeping + reward/done (one env)."""
  w, h = cfg.area
  step_ = state.step

  if balance is True:
    state = _balance_apply(state, k_balance, cfg)
  elif balance is None:
    state = jax.lax.cond(
        (step_ % cfg.balance_every) == 0,
        lambda s, k: _balance_apply(s, k, cfg), lambda s, k: s,
        state, k_balance)

  # Track chunks that held entities (the reference's defaultdict keys,
  # engine.py:36/:57/:78-79, consumed by env.py:90-95).
  touched = state.chunk_touched | _chunk_reduce(
      (state.ent.etype > 0).reshape(w, h), cfg, False, jnp.any)

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
