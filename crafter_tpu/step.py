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


def _fmix(v: jax.Array) -> jax.Array:
  """32-bit avalanche (murmur3-style finalizer)."""
  v = v ^ (v >> 16)
  v = v * jnp.uint32(0x7FEB352D)
  v = v ^ (v >> 15)
  v = v * jnp.uint32(0x846CA68B)
  v = v ^ (v >> 16)
  return v


def _cell_bits(seed: jax.Array, chan: int, w: int, h: int) -> jax.Array:
  """Per-cell uint32 random bits from a counter-based hash.

  Each (seed, channel, cell) triple maps through two avalanche rounds —
  the same construction as the worldgen hash (ops/noise.py:noise3_fast),
  an order of magnitude cheaper than threefry at these volumes.
  """
  x, y = _iota2(w, h)
  v = (seed + jnp.uint32(chan) * jnp.uint32(0x9E3779B9)
       + x.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
       + y.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35))
  return _fmix(_fmix(v))


def _cell_uniform(seed: jax.Array, chan: int, w: int, h: int) -> jax.Array:
  """Per-cell iid uniforms in [0, 1).

  The reference draws lazily from one MT19937 stream as its Python loops
  touch entities (objects.py passim); each draw is consumed at most once,
  so iid per-cell uniforms give the identical joint distribution.
  """
  bits = _cell_bits(seed, chan, w, h)
  return (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))


def _toward(px, py, x, y, long_axis):
  """Per-cell axis-aligned step toward the player (objects.py:54-62).

  Picks the long axis when ``long_axis`` else the short axis; ties go to y
  (``dists[0] > dists[1]`` vs ``<=``).  Returns (mvx, mvy) planes in
  {-1, 0, 1}; a zero offset on the chosen axis yields a (0, 0) "move" that
  can never succeed (the reference moves onto its own occupied cell).
  """
  offx, offy = px - x, py - y
  use_x = jnp.where(long_axis, jnp.abs(offx) > jnp.abs(offy),
                    jnp.abs(offx) <= jnp.abs(offy))
  mvx = jnp.where(use_x, jnp.sign(offx), 0)
  mvy = jnp.where(use_x, 0, jnp.sign(offy))
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


def _player_phase(state: State, action: jax.Array, key: jax.Array,
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
  got = jax.random.uniform(key) <= prob
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
# ---------------------------------------------------------------------------


def _mob_phase(state: State, key: jax.Array, cfg: EnvConfig,
               plant_spawn, plant_pos):
  """All non-player entities decide simultaneously on their cells.

  Decisions are computed in the *source-cell* domain on the post-player
  state, movement carries every channel through four shifted claim planes,
  and post-move effects (zombie melee, plant damage) read the moved planes.
  """
  t = rules.TABLES
  w, h = cfg.area
  M = state.mat_map.astype(jnp.int32)
  T = state.ent.etype.astype(jnp.int32)
  Hp = state.ent.health.astype(jnp.int32)
  A = state.ent.aux.astype(jnp.int32)
  F = state.ent.facing.astype(jnp.int32)
  ppos = state.player.pos
  sleeping = state.player.sleeping

  seed = jax.random.bits(key, (), jnp.uint32)
  u = [_cell_uniform(seed, c, w, h) for c in range(8)]

  x, y = _iota2(w, h)
  pdist = jnp.abs(x - ppos[0]) + jnp.abs(y - ppos[1])
  pending = plant_spawn & _onehot(plant_pos, w, h)

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
  rdx, rdy = _dirvec(jnp.minimum((u[7] * 4).astype(jnp.int32), 3))
  # Cow: random walk with p=0.5 (objects.py:277-279).
  cow_wants = u[0] < 0.5
  # Zombie: chase within dist 8 with p=0.9 (long axis p=0.8), else random
  # walk (objects.py:297-301).
  chase = (pdist <= 8) & (u[0] < 0.9)
  twx, twy = _toward(ppos[0], ppos[1], x, y, u[1] < 0.8)
  zx = jnp.where(chase, twx, rdx)
  zy = jnp.where(chase, twy, rdy)
  # Skeleton (objects.py:327-341): retreat at dist<=3; on a failed retreat
  # fall through the elif chain (shoot / approach / walk).
  retreat = pdist <= 3
  rwx, rwy = _toward(ppos[0], ppos[1], x, y, u[2] < 0.6)
  c_shoot = (pdist <= 5) & (u[3] < 0.5)
  c_approach = (pdist <= 8) & (u[4] < 0.3)
  c_walk = u[5] < 0.2
  awx, awy = _toward(ppos[0], ppos[1], x, y, u[6] < 0.6)
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
  tmat = jnp.zeros((w, h), jnp.int32)
  tocc = jnp.zeros((w, h), bool)
  inside_t = jnp.zeros((w, h), bool)
  for d in range(4):
    sel = (mvx == DIRS[d][0]) & (mvy == DIRS[d][1])
    tmat = jnp.where(sel, _pull(M, d), tmat)
    tocc = jnp.where(sel, _pull(occ0, d), tocc)
    nx, ny = x + DIRS[d][0], y + DIRS[d][1]
    inside_t = jnp.where(
        sel, (nx >= 0) & (nx < w) & (ny >= 0) & (ny < h), inside_t)
  moving = (mvx != 0) | (mvy != 0)  # a (0,0) `toward` never succeeds
  # A cell "targeting itself" (zero move vector) reads its own attributes
  # in the reference; feasibility fails there via the occupancy check.
  tmat = jnp.where(moving, tmat, M)
  tocc = jnp.where(moving, tocc, occ0)
  inside_t = jnp.where(moving, inside_t, True)

  # Arrow impact decisions (objects.py:373-384): hit / despawn / fly.
  a_hit = is_arrow & active & tocc
  a_block = (is_arrow & active & ~a_hit
             & ~_mat_in(tmat, t.walkable_arrow))
  a_fly = is_arrow & active & ~a_hit & ~a_block

  wants = active & ~dying & (
      (is_cow & cow_wants) | is_zom | (is_skel & skel_wants) | a_fly)

  # --- movement: four claim planes + direction-priority select -----------
  walk_ok = jnp.where(is_arrow, _mat_in(tmat, t.walkable_arrow),
                      _mat_in(tmat, t.walkable_mob))
  feasible = inside_t & walk_ok & ~tocc
  valid = wants & feasible & moving

  claims = []
  taken = jnp.zeros((w, h), bool)
  success = jnp.zeros((w, h), bool)
  for d in range(4):
    mover_d = valid & (mvx == DIRS[d][0]) & (mvy == DIRS[d][1])
    win_d = _push(mover_d, d) & ~taken
    taken = taken | win_d
    claims.append(win_d)
    success = success | (_pull(win_d, d) & mover_d)

  # --- skeleton shooting decision (objects.py:330-351).  A dead skeleton
  # "moves" whenever the retreat cell is free (World.move no-ops on removed
  # objects but Object.move still reports success, engine.py:67-69).
  s_moved = jnp.where(dying, retreat & feasible, retreat & success)
  reload = jnp.where(active & is_skel, jnp.maximum(0, A - 1), A)
  shoot = active & is_skel & ~s_moved & c_shoot & (reload == 0)
  shvx, shvy = _toward(ppos[0], ppos[1], x, y, True)

  # --- arrow impacts: damage at the target cell, applied pre-move so it
  # travels with a mob that also moves this tick (the round-1 semantics).
  dmg = jnp.zeros((w, h), jnp.int32)
  for d in range(4):
    dmg = dmg + 2 * _push(a_hit & (F == d), d).astype(jnp.int32)
  player_arrow_dmg = _read(dmg, _onehot(ppos, w, h))
  Hp = jnp.maximum(0, Hp - jnp.where(T > rules.E_PLAYER, dmg, 0))
  # Arrows destroy tables/furnaces into path (objects.py:380-382); the
  # masked select is idempotent, so several arrows smashing one cell are
  # fine (unlike round 1's summed scatter).
  smash_src = a_block & ((tmat == rules.MAT_TABLE)
                         | (tmat == rules.MAT_FURNACE))
  smash = jnp.zeros((w, h), bool)
  for d in range(4):
    smash = smash | _push(smash_src & (F == d), d)
  M = jnp.where(smash, rules.MAT_PATH, M)

  # --- plants grow before moving planes are built (objects.py:405-407).
  A = jnp.where(active & is_plant, A + 1, A)
  A = jnp.where(is_skel, reload, A)

  # --- apply movement: carry every channel through the claim planes ------
  T1 = jnp.where(success, 0, T)
  H1 = Hp
  A1 = A
  F1 = F
  for d in range(4):
    T1 = jnp.where(claims[d], _push(T, d), T1)
    H1 = jnp.where(claims[d], _push(Hp, d), H1)
    A1 = jnp.where(claims[d], _push(A, d), A1)
    F1 = jnp.where(claims[d], _push(F, d), F1)

  # --- zombie melee (objects.py:302-312): post-move adjacency, cooldown
  # counts down only while adjacent, 7 damage if the player sleeps.
  z_adj = (T1 == rules.E_ZOMBIE) & (pdist <= 1)
  z_att = z_adj & (A1 == 0)
  A1 = jnp.where(z_adj, jnp.where(z_att, 5, A1 - 1), A1)
  zdmg = jnp.sum(jnp.where(z_att, jnp.where(sleeping, 7, 2), 0))

  # --- plant damage from adjacent mobs (objects.py:408-411): post-move
  # positions, pre-removal liveness (dying mobs still occupy their cell).
  hostile = ((T1 == rules.E_COW) | (T1 == rules.E_ZOMBIE)
             | (T1 == rules.E_SKELETON))
  nbr_hostile = jnp.zeros((w, h), bool)
  for d in range(4):
    nbr_hostile = nbr_hostile | _push(hostile, d)
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
  arrow_ok_src = jnp.zeros((w, h), bool)
  staken = jnp.zeros((w, h), bool)
  for d in range(4):
    spawn_d = shoot & (shvx == DIRS[d][0]) & (shvy == DIRS[d][1])
    win_d = _push(spawn_d, d) & spawn_free & ~staken
    staken = staken | win_d
    T1 = jnp.where(win_d, rules.E_ARROW, T1)
    H1 = jnp.where(win_d, 0, H1)
    A1 = jnp.where(win_d, 0, A1)
    F1 = jnp.where(win_d, d, F1)
    arrow_ok_src = arrow_ok_src | (_pull(win_d, d) & spawn_d)
  A1 = jnp.where(arrow_ok_src, 4, A1)  # shooter reloads

  player = state.player.replace(
      inventory=state.player.inventory.at[rules.ITEM_HEALTH].set(
          jnp.maximum(0, state.player.inventory[rules.ITEM_HEALTH]
                      - zdmg - player_arrow_dmg)))
  ent = EntMaps(etype=T1.astype(state.ent.etype.dtype),
                health=H1.astype(state.ent.health.dtype),
                aux=A1.astype(state.ent.aux.dtype),
                facing=F1.astype(state.ent.facing.dtype))
  return state.replace(mat_map=M.astype(state.mat_map.dtype),
                       ent=ent, player=player)


# ---------------------------------------------------------------------------
# Phase 3: chunk balancing (env.py:141-179).
# ---------------------------------------------------------------------------


def _chunk_view(grid: jax.Array, cfg: EnvConfig, fill) -> jax.Array:
  """(W, H) -> (n_chunks, csx*csy) by padding to a chunk multiple."""
  (csx, csy), (ncx, ncy) = cfg.chunk_size, cfg.n_chunks
  pad = jnp.full((ncx * csx, ncy * csy), fill, grid.dtype)
  pad = pad.at[:grid.shape[0], :grid.shape[1]].set(grid)
  return (pad.reshape(ncx, csx, ncy, csy).transpose(0, 2, 1, 3)
          .reshape(ncx * ncy, csx * csy))


def _chunk_broadcast(vals: jax.Array, cfg: EnvConfig) -> jax.Array:
  """(n_chunks,) per-chunk values -> (W, H) plane."""
  (csx, csy), (ncx, ncy) = cfg.chunk_size, cfg.n_chunks
  w, h = cfg.area
  full = jnp.repeat(jnp.repeat(vals.reshape(ncx, ncy), csx, 0), csy, 1)
  return full[:w, :h]


def _balance_phase(state: State, key: jax.Array, cfg: EnvConfig):
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

  k_gate, k_cells = jax.random.split(key)
  seed = jax.random.bits(k_cells, (), jnp.uint32)

  # Per-chunk, per-class creature counts and material space.
  etv = _chunk_view(T, cfg, 0)                        # (nch, cs)
  matv = _chunk_view(M, cfg, 0)
  counts = jnp.stack(
      [(etv == e).sum(-1) for e in BAL_CLASSES], -1)  # (nch, 3)
  grass_n = (matv == rules.MAT_GRASS).sum(-1)
  path_n = (matv == rules.MAT_PATH).sum(-1)
  touched = state.chunk_touched.reshape(-1)

  # Spawn/despawn targets (env.py:143-155).  int() truncation on the floats.
  tmin = jnp.stack([
      jnp.where(grass_n < 50, 0.0, 3.5 - 3 * light),
      jnp.where(path_n < 6, 0.0, 1.0),
      jnp.where(grass_n < 30, 0.0, 1.0)], -1)         # (nch, 3)
  tmax = jnp.stack([
      jnp.broadcast_to(3.5 - 3 * light, (nch,)),
      jnp.full((nch,), 2.0),
      jnp.broadcast_to(1.5 + light, (nch,))], -1)

  gate = jax.random.uniform(k_gate, (nch, 3, 2))
  want_spawn = (touched[:, None]
                & (counts < jnp.trunc(tmin).astype(jnp.int32))
                & (gate[..., 0] < jnp.asarray(BAL_SPAWN_P)))
  want_despawn = (touched[:, None] & ~want_spawn
                  & (counts > jnp.trunc(tmax).astype(jnp.int32))
                  & (gate[..., 1] < jnp.asarray(BAL_DESPAWN_P)))

  # Unique-within-chunk random scores: random high bits, cell rank low bits.
  rank = ((x % csx) * csy + y % csy).astype(jnp.int32)  # < csx*csy <= 4096

  def pick(member, chan):
    """Uniform random member cell per chunk -> (W, H) one-pick-per-chunk."""
    bits = (_cell_bits(seed, chan, w, h) >> 13).astype(jnp.int32)
    score = jnp.where(member, (bits << 12) | rank, -1)
    best = jnp.max(_chunk_view(score, cfg, -1), -1)     # (nch,)
    return member & (score == _chunk_broadcast(best, cfg)) & (score >= 0)

  despawn = jnp.zeros((w, h), bool)
  spawn_masks = []
  for i, etype in enumerate(BAL_CLASSES):
    #

    # Despawn: uniform random creature of the class in the chunk, removed
    # when far enough from the player (env.py:175-179).
    d_pick = pick(T == etype, 8 + i)
    despawn = despawn | (
        d_pick & _chunk_broadcast(want_despawn[:, i], cfg)
        & (pdist >= BAL_DESPAN[i]))
    # Spawn: uniform random cell of the class material (occupied cells are
    # candidates too — the reference picks first, then fails on occupancy).
    s_pick = pick(M == BAL_MATERIAL[i], 11 + i)
    spawn_masks.append(
        s_pick & _chunk_broadcast(want_spawn[:, i], cfg)
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
  w, h = cfg.area
  key, k_player, k_mob, k_balance = jax.random.split(state.key, 4)
  step_ = state.step + 1
  state = state.replace(step=step_, key=key)

  state, plant_spawn, plant_pos = _player_phase(state, action, k_player, cfg)
  state = _mob_phase(state, k_mob, cfg, plant_spawn, plant_pos)

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
  occupied = _chunk_view(state.ent.etype.astype(jnp.int32), cfg, 0)
  touched = (state.chunk_touched.reshape(-1) | (occupied > 0).any(-1))
  touched = touched.reshape(cfg.n_chunks)

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
  return state, StepOut(reward=reward, done=done, dead=dead)
