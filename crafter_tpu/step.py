"""The simulation tick as one fused, branch-free device kernel.

The reference advances the world by iterating a Python object list and
letting every entity mutate the world in place
(reference: crafter/env.py:83-118, crafter/objects.py).  Here the whole tick
is a single pure function ``step(state, action) -> (state, out)`` built from
masked, table-driven array ops, so thousands of envs step in lockstep under
``jit``/``vmap`` and the entire tick fuses into a handful of XLA kernels on
the TPU's VPU (no MXU work here — the state is tiny; throughput comes from
batching and fusion, not FLOPs).

Phase order inside a tick mirrors the reference exactly:

1. step += 1, daylight update                      (env.py:84-85, :135-139)
2. player update — the player is always the first  (env.py:86-89; the player
   entry of the object list)                        is ``_objects[1]``)
3. mob/arrow/plant updates                          (env.py:87-89)
4. chunk balancing every 10 steps                   (env.py:90-95, :141-179)
5. reward / done / info                             (env.py:96-118)

Sequential-to-parallel mapping (SURVEY.md §7 hard part 3): the reference
updates entities one at a time, so later entities observe earlier entities'
moves.  Here all mobs decide simultaneously against the post-player state and
movement conflicts are resolved with a *claim* scatter: every valid mover
scatter-mins its slot index into its target cell and moves only if it won,
which reproduces the reference's iteration-order priority (lowest slot wins).
Deliberate deviations, all rare and distribution-neutral:

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
* the 3×3 "nearby" crafting window is *empty* when the player stands on the
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
from .ops import maps
from .state import Entities, Player, State

# Class indices for chunk balancing, in the reference's balancing order
# (env.py:143-155: Zombie, Skeleton, Cow).
BAL_CLASSES = (rules.E_ZOMBIE, rules.E_SKELETON, rules.E_COW)
# (material, span_dist, despan_dist, spawn_prob, despawn_prob) per class
# (env.py:143-155).
BAL_MATERIAL = (rules.MAT_GRASS, rules.MAT_PATH, rules.MAT_GRASS)
BAL_SPAN = (6, 7, 5)
BAL_DESPAN = (0, 7, 5)
BAL_SPAWN_P = (0.3, 0.1, 0.01)
BAL_DESPAWN_P = (0.4, 0.1, 0.1)
# Initial health per entity type (cow 3, zombie 5, skeleton 3, plant 1;
# objects.py:267, :286, :319, :391).
TYPE_HEALTH = np.array([0, 0, 3, 5, 3, 0, 1], np.int32)


@struct.dataclass
class StepOut:
  """Per-tick results consumed by the env wrapper (env.py:96-118)."""

  reward: jax.Array        # () float32 — Δhealth/10 + 1.0 on new unlock
  done: jax.Array          # () bool — dead or episode length reached
  dead: jax.Array          # () bool — discount = 1 - dead (env.py:111)


def _walk_table() -> np.ndarray:
  """(entity type, material) -> may stand there.  Plants never move."""
  t = rules.TABLES
  table = np.zeros((rules.N_ENTITY_TYPES, rules.N_MATERIALS), bool)
  table[rules.E_PLAYER] = t.walkable_player
  table[rules.E_COW] = t.walkable_mob
  table[rules.E_ZOMBIE] = t.walkable_mob
  table[rules.E_SKELETON] = t.walkable_mob
  table[rules.E_ARROW] = t.walkable_arrow
  return table


def _inside(pos: jax.Array, area: Tuple[int, int]) -> jax.Array:
  x, y = pos[..., 0], pos[..., 1]
  return (0 <= x) & (x < area[0]) & (0 <= y) & (y < area[1])


def _toward(src: jax.Array, dst: jax.Array, long_axis) -> jax.Array:
  """Axis-aligned step toward dst (objects.py:54-62).

  Picks the long axis when `long_axis` else the short axis; ties go to y
  (`dists[0] > dists[1]` vs `<=`).
  """
  off = dst - src
  adx, ady = jnp.abs(off[..., 0]), jnp.abs(off[..., 1])
  use_x = jnp.where(long_axis, adx > ady, adx <= ady)
  sx, sy = jnp.sign(off[..., 0]), jnp.sign(off[..., 1])
  zeros = jnp.zeros_like(sx)
  return jnp.where(use_x[..., None],
                   jnp.stack([sx, zeros], -1),
                   jnp.stack([zeros, sy], -1))


# ---------------------------------------------------------------------------
# Phase 1: player update (objects.py:99-261).
# ---------------------------------------------------------------------------


def _player_phase(state: State, action: jax.Array, key: jax.Array,
                  cfg: EnvConfig):
  """Pure re-derivation of Player.update (objects.py:99-131).

  Returns the post-player state pieces plus a pending plant-spawn request
  (applied after the mob phase so the fresh plant does not update this tick,
  matching the reference's copy-at-loop-start iteration, engine.py:41-44).
  """
  t = rules.TABLES
  p = state.player
  inv = p.inventory
  mat_map, obj_map, ent = state.mat_map, state.obj_map, state.ent
  pos = ent.pos[0]
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
  # (objects.py:100 computes it at update start).  The phase's point
  # lookups (do/place target + move target + crafting window) share one
  # fused material gather and one occupancy match.
  target = pos + jnp.asarray(rules.DIRS)[p.facing]
  move_dir_idx = jnp.clip(action - 1, 0, 3)
  mtarget = pos + jnp.asarray(rules.DIRS)[move_dir_idx]
  dx, dy = jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2), indexing='ij')
  wpos = pos + jnp.stack([dx, dy], -1)            # (3, 3, 2) make window
  pts = jnp.concatenate([target[None], mtarget[None], pos[None],
                         wpos.reshape(9, 2)])
  pmat = maps.map_gather(mat_map, pts)
  tmat, mtmat, heremat = pmat[0], pmat[1], pmat[2]
  wmat = pmat[3:].reshape(3, 3)
  alive = ent.etype > 0
  occ = maps.occupant(jnp.stack([target, mtarget]), ent.pos, alive)
  tobj = occ[0]                                    # slot+1, 0 empty
  t_inside = _inside(target, cfg.area)

  is_move = (1 <= action) & (action <= 4)
  is_do = action == rules.A_DO
  is_sleep = action == rules.A_SLEEP
  is_place = (7 <= action) & (action <= 10)
  is_make = (11 <= action) & (action <= 16)

  # --- move (objects.py:174-179): facing set even when blocked. ----------
  facing = jnp.where(is_move, move_dir_idx, p.facing)
  wp = jnp.asarray(t.walkable_player, jnp.int32)
  can_move = (is_move & _inside(mtarget, cfg.area)
              & maps.table_gather(wp, mtmat).astype(bool)
              & (occ[1] == 0))
  new_pos = jnp.where(can_move, mtarget, pos)
  # obj_map is rebuilt from the entity table once per tick (see step()).
  # Standing on lava after the move attempt is instant death
  # (objects.py:178-179) — checked at the post-move cell either way.
  on_lava = is_move & (jnp.where(can_move, mtmat, heremat)
                       == rules.MAT_LAVA)
  inv = inv.at[rules.ITEM_HEALTH].set(
      jnp.where(on_lava, 0, inv[rules.ITEM_HEALTH]))

  # --- do on an entity (objects.py:181-213). -----------------------------
  do_obj = is_do & (tobj > 0)
  tslot = jnp.where(do_obj, tobj - 1, -1)
  ttype = maps.table_gather(ent.etype, tslot[None])[0]  # fill 0 = none
  damage = jnp.max(jnp.stack([
      jnp.int32(1),
      jnp.where(inv[rules.ITEM_ID['wood_sword']] > 0, 2, 0),
      jnp.where(inv[rules.ITEM_ID['stone_sword']] > 0, 3, 0),
      jnp.where(inv[rules.ITEM_ID['iron_sword']] > 0, 5, 0)]))
  # Ripe plant: eat, reset growth, +4 food (objects.py:188-192).
  taux = maps.table_gather(ent.aux, tslot[None], precise=True)[0]
  thp = maps.table_gather(ent.health, tslot[None])[0]
  eat_plant = do_obj & (ttype == rules.E_PLANT) & (taux > 300)
  ent = ent.replace(aux=maps.table_scatter_set(
      ent.aux, tslot[None], 0, eat_plant[None]))
  # Mobs take damage; health floors at 0 (objects.py:28-30 setter).
  hit_mob = do_obj & ((ttype == rules.E_ZOMBIE) | (ttype == rules.E_SKELETON)
                      | (ttype == rules.E_COW))
  hp_after = jnp.maximum(0, thp - damage)
  ent = ent.replace(health=maps.table_scatter_set(
      ent.health, tslot[None], hp_after[None], hit_mob[None]))
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
  do_mat = is_do & (tobj == 0)
  drink_water = do_mat & (tmat == rules.MAT_WATER)
  can_collect = (do_mat & jnp.asarray(t.collectible)[tmat]
                 & jnp.all(inv >= jnp.asarray(t.collect_require)[tmat]))
  # Leaves are applied before the probability draw (objects.py:225-226).
  leave = jnp.asarray(t.collect_leaves)[tmat]
  mat_map = maps.map_scatter(mat_map, target[None], leave[None],
                             (can_collect & t_inside)[None])
  got = jax.random.uniform(key) <= jnp.asarray(t.collect_prob)[tmat]
  receive = can_collect & got
  inv = inv + jnp.where(receive, jnp.asarray(t.collect_receive)[tmat], 0)
  cach = jnp.asarray(t.collect_ach)[tmat]
  ach = ach.at[jnp.where(receive & (cach >= 0), cach,
                         rules.N_ACHIEVEMENTS)].add(1, mode='drop')

  # --- sleep (objects.py:117-119). ---------------------------------------
  sleeping = sleeping | (is_sleep & (inv[rules.ITEM_ENERGY] < energy_max))

  # --- place (objects.py:231-249). ---------------------------------------
  pidx = jnp.clip(action - 7, 0, 3)
  place_ok = (is_place & (tobj == 0)
              & jnp.asarray(t.place_where)[pidx, tmat]
              & jnp.all(inv >= jnp.asarray(t.place_uses)[pidx]))
  inv = inv - jnp.where(place_ok, jnp.asarray(t.place_uses)[pidx], 0)
  place_mat = place_ok & jnp.asarray(t.place_is_material)[pidx]
  mat_map = maps.map_scatter(
      mat_map, target[None], jnp.asarray(t.place_material)[pidx][None],
      place_mat[None])
  plant_spawn = place_ok & ~jnp.asarray(t.place_is_material)[pidx]
  ach = ach.at[jnp.where(place_ok, jnp.asarray(t.place_ach)[pidx],
                         rules.N_ACHIEVEMENTS)].add(1, mode='drop')

  # --- make (objects.py:251-261): 3×3 nearby window with the numpy
  # empty-slice quirk at the x==0 / y==0 edges (engine.py:95-103).
  midx = jnp.clip(action - 11, 0, 5)
  wvalid = ((pos[0] >= 1) & (pos[1] >= 1)
            & (wpos[..., 0] < cfg.area[0]) & (wpos[..., 1] < cfg.area[1]))
  nearby = ((wmat[..., None] == jnp.arange(rules.N_MATERIALS))
            & wvalid[..., None]).any((0, 1))
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
      facing=facing, inventory=inv, achievements=ach, sleeping=sleeping,
      hunger=hunger, thirst=thirst, fatigue=fatigue, recover=recover,
      last_health=hp)
  ent = ent.replace(pos=ent.pos.at[0].set(new_pos),
                    health=ent.health.at[0].set(hp))
  state = state.replace(mat_map=mat_map, obj_map=obj_map, ent=ent,
                        player=player)
  return state, plant_spawn, jnp.where(plant_spawn, target,
                                       jnp.full((2,), -1, jnp.int32))


# ---------------------------------------------------------------------------
# Phase 2: mobs, arrows, plants (objects.py:264-411).
# ---------------------------------------------------------------------------


def _mob_phase(state: State, key: jax.Array, cfg: EnvConfig,
               plant_spawn, plant_pos):
  """All non-player entities decide simultaneously; claims order conflicts.

  Every map access here runs through the one-hot primitives in ops/maps.py
  — per-point gathers/scatters at (batch, K) shapes serialize on TPU and
  would cost ~35 ms each.
  """
  t = rules.TABLES
  k = cfg.max_entities
  w, h = cfg.area
  ent = state.ent
  mat_map, obj_map = state.mat_map, state.obj_map
  slots = jnp.arange(k)
  et, pos, hp, aux = ent.etype, ent.pos, ent.health, ent.aux
  ppos = pos[0]
  sleeping = state.player.sleeping

  k_u, k_dir = jax.random.split(key)
  u = jax.random.uniform(k_u, (k, 8))
  rdir = jnp.asarray(rules.DIRS)[jax.random.randint(k_dir, (k,), 0, 4)]

  pdist = jnp.abs(pos - ppos).sum(-1)
  active = (et > 0) & (slots != 0) & (pdist < cfg.update_distance)
  is_cow = et == rules.E_COW
  is_zom = et == rules.E_ZOMBIE
  is_skel = et == rules.E_SKELETON
  is_arrow = et == rules.E_ARROW
  is_plant = et == rules.E_PLANT
  # Mobs at zero health are removed at the start of their own update but
  # still run their attack logic this tick (objects.py:274-276, :294-296,
  # :327-329 remove then fall through).
  dying = active & (hp <= 0) & (is_cow | is_zom | is_skel)

  # The freshly placed plant's cell counts as occupied for every check this
  # tick (in the reference it is added mid-tick, objects.py:248); it is
  # compared against positions directly instead of writing a sentinel.
  def pending_at(p):
    return plant_spawn & (p == plant_pos).all(-1)

  # --- decisions -----------------------------------------------------------
  # Cow: random walk with p=0.5 (objects.py:277-279).
  cow_wants = is_cow & (u[:, 0] < 0.5)
  # Zombie: chase within dist 8 with p=0.9 (long axis p=0.8), else random
  # walk (objects.py:297-301).
  chase = (pdist <= 8) & (u[:, 0] < 0.9)
  zdir = jnp.where(chase[:, None],
                   _toward(pos, ppos, u[:, 1] < 0.8), rdir)
  # Skeleton (objects.py:327-341): retreat at dist<=3; on a failed retreat
  # fall through the elif chain (shoot / approach / walk).
  retreat = pdist <= 3
  sdir_retreat = -_toward(pos, ppos, u[:, 2] < 0.6)
  c_shoot = (pdist <= 5) & (u[:, 3] < 0.5)
  c_approach = (pdist <= 8) & (u[:, 4] < 0.3)
  c_walk = u[:, 5] < 0.2
  sdir_other = jnp.where(
      (~c_shoot & c_approach)[:, None],
      _toward(pos, ppos, u[:, 6] < 0.6), rdir)
  s_wants_other = ~c_shoot & (c_approach | c_walk)
  sdir = jnp.where(retreat[:, None], sdir_retreat, sdir_other)
  skel_wants = retreat | s_wants_other
  # Arrows fly along their facing; their `target` below doubles as the
  # impact cell (objects.py:373-384).
  adir = jnp.asarray(rules.DIRS)[ent.facing]

  move_dir = jnp.where(is_zom[:, None], zdir,
                       jnp.where(is_skel[:, None], sdir,
                                 jnp.where(is_arrow[:, None], adir, rdir)))
  target = pos + move_dir
  # One fused material lookup for both point sets used this phase (move
  # targets + potential skeleton arrow-spawn cells).
  arrow_pos_early = pos + _toward(pos, ppos, True)
  both_mat = maps.map_gather(
      mat_map, jnp.concatenate([target, arrow_pos_early]))
  tmat, arrow_mat = both_mat[:k], both_mat[k:]
  alive = et > 0
  tobj_raw = maps.occupant(target, pos, alive)
  tobj = jnp.where((tobj_raw == 0) & pending_at(target), k + 1, tobj_raw)

  # Arrow impact decisions (objects.py:373-384): hit / despawn / fly.
  a_hit = is_arrow & active & (tobj > 0)
  a_block = (is_arrow & active & ~a_hit
             & ~maps.table_gather(
                 jnp.asarray(t.walkable_arrow, jnp.int32), tmat).astype(bool))
  a_fly = is_arrow & active & ~a_hit & ~a_block

  wants = active & ~dying & (
      cow_wants | is_zom | (is_skel & skel_wants) | a_fly)

  # --- claim-based movement resolution ------------------------------------
  walk_flat = jnp.asarray(_walk_table().reshape(-1).astype(np.int32))
  walk_ok = maps.table_gather(
      walk_flat, et * rules.N_MATERIALS + tmat).astype(bool)
  feasible = _inside(target, cfg.area) & walk_ok & (tobj == 0)
  valid = wants & feasible
  won = maps.claim_lowest(target, valid)
  npos = jnp.where(won[:, None], target, pos)

  # --- zombie melee (objects.py:302-312): post-move adjacency, cooldown
  # counts down only while adjacent, 7 damage if the player sleeps.
  ndist = jnp.abs(npos - ppos).sum(-1)
  z_adj = active & is_zom & (ndist <= 1)
  z_att = z_adj & (aux == 0)
  aux = jnp.where(z_adj, jnp.where(z_att, 5, aux - 1), aux)
  zdmg = jnp.where(z_att, jnp.where(sleeping, 7, 2), 0).sum()

  # --- skeleton shooting (objects.py:330-351).  A dead skeleton "moves"
  # whenever the retreat cell is free (World.move no-ops on removed objects
  # but Object.move still reports success, engine.py:67-69).
  s_moved = jnp.where(dying, retreat & feasible, retreat & won)
  reload = jnp.where(active & is_skel, jnp.maximum(0, aux - 1), aux)
  shoot = (active & is_skel & ~s_moved & c_shoot & (reload == 0))
  shoot_dir = _toward(pos, ppos, True)
  arrow_pos = pos + shoot_dir

  # --- arrow impacts -------------------------------------------------------
  dmg = maps.table_scatter_add(
      k, jnp.where(a_hit & (tobj <= k), tobj - 1, -1), 2)
  player_arrow_dmg = dmg[0]
  hp = jnp.maximum(0, hp - jnp.where(slots == 0, 0, dmg))
  # Arrows destroy tables/furnaces into path (objects.py:380-382).  Two
  # arrows blocked by the same cell in one tick must not both scatter
  # (map_scatter sums duplicate one-hot rows) — claim the cell first.
  smash = a_block & ((tmat == rules.MAT_TABLE)
                     | (tmat == rules.MAT_FURNACE))
  smash = maps.claim_lowest(target, smash)
  mat_map = maps.map_scatter(mat_map, target, rules.MAT_PATH, smash)

  # --- plants (objects.py:405-411): grow, take damage from adjacent mobs.
  # Adjacency checked against post-move positions, pre-removal liveness
  # (dying mobs still occupy their cell at this point, as in the map-based
  # formulation).
  aux = jnp.where(active & is_plant, aux + 1, aux)
  nbrs = npos[:, None, :] + jnp.asarray(rules.DIRS)[None, :, :]  # (K, 4, 2)
  nslot = maps.occupant(nbrs, npos, alive) - 1                   # (K, 4)
  ntype = maps.table_gather(et, nslot)         # OOB/empty -> 0 (none)
  hostile = ((ntype == rules.E_ZOMBIE) | (ntype == rules.E_SKELETON)
             | (ntype == rules.E_COW)).any(-1)
  hp = jnp.where(active & is_plant & hostile, jnp.maximum(0, hp - 1), hp)
  plant_dead = active & is_plant & (hp <= 0)

  # --- removals ------------------------------------------------------------
  removed = dying | (a_hit | a_block) | plant_dead
  et = jnp.where(removed, 0, et)

  # Arrow spawn feasibility (objects.py:348-351): target must be free and
  # arrow-walkable; reload resets only when the shot happens.  (The
  # arrow-spawn material gather shares the phase's single fused mat-map
  # lookup below.)
  aw = jnp.asarray(t.walkable_arrow, jnp.int32)
  arrow_ok = (shoot & _inside(arrow_pos, cfg.area)
              & maps.table_gather(aw, arrow_mat).astype(bool)
              & (maps.occupant(arrow_pos, npos, et > 0) == 0)
              & ~pending_at(arrow_pos))
  reload = jnp.where(arrow_ok, 4, reload)
  aux = jnp.where(is_skel, reload, aux)

  ent = Entities(etype=et, pos=npos, health=hp, aux=aux, facing=ent.facing)
  player = state.player.replace(
      inventory=state.player.inventory.at[rules.ITEM_HEALTH].set(
          jnp.maximum(0, state.player.inventory[rules.ITEM_HEALTH]
                      - zdmg - player_arrow_dmg)))
  state = state.replace(mat_map=mat_map, ent=ent, player=player)
  arrow_req = dict(valid=arrow_ok, pos=arrow_pos,
                   facing=_dir_index(shoot_dir))
  return state, arrow_req


def _dir_index(vec: jax.Array) -> jax.Array:
  """Direction vector -> index into rules.DIRS."""
  d = jnp.asarray(rules.DIRS)  # (4, 2)
  eq = (vec[..., None, :] == d).all(-1)  # (..., 4)
  return jnp.argmax(eq, -1)


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


def _balance_phase(state: State, key: jax.Array, cfg: EnvConfig):
  """Spawn/despawn mobs toward daylight-dependent per-chunk targets.

  The reference visits every chunk that ever held an object (a defaultdict
  grown on add/move, engine.py:36, :57, :78-79) and, per class, spawns at a
  random material cell or despawns a random creature (env.py:157-179).
  """
  t = rules.TABLES
  k = cfg.max_entities
  w, h = cfg.area
  (csx, csy), (ncx, ncy) = cfg.chunk_size, cfg.n_chunks
  nch = ncx * ncy
  ent = state.ent
  slots = jnp.arange(k)
  light = state_lib.daylight(state.step, cfg.day_length)
  ppos = ent.pos[0]

  k_gate, k_cells, k_pick, k_despawn = jax.random.split(key, 4)

  live = ent.etype > 0
  cid = (ent.pos[:, 0] // csx) * ncy + ent.pos[:, 1] // csy
  touched = state.chunk_touched.reshape(-1)

  # Per-chunk, per-class creature counts (dense segment-sum, ops/maps.py).
  cls = jnp.full((k,), -1, jnp.int32)
  for ci, etype in enumerate(BAL_CLASSES):
    cls = jnp.where(ent.etype == etype, ci, cls)
  member = live & (cls >= 0)
  seg = jnp.where(member, cid * 3 + cls, -1)
  counts = maps.table_scatter_add(nch * 3, seg, 1).reshape(nch, 3)

  # Per-chunk material space and random spawn cells.
  matv = _chunk_view(state.mat_map, cfg, 0)             # (nch, csx*csy)
  grass_n = (matv == rules.MAT_GRASS).sum(-1)
  path_n = (matv == rules.MAT_PATH).sum(-1)

  # Spawn/despawn targets (env.py:143-155).  int() truncation on the floats.
  tmin = jnp.stack([
      jnp.where(grass_n < 50, 0.0, 3.5 - 3 * light),
      jnp.where(path_n < 6, 0.0, 1.0),
      jnp.where(grass_n < 30, 0.0, 1.0)], -1)           # (nch, 3)
  tmax = jnp.stack([
      jnp.broadcast_to(3.5 - 3 * light, (nch,)),
      jnp.full((nch,), 2.0),
      jnp.broadcast_to(1.5 + light, (nch,))], -1)

  gate = jax.random.uniform(k_gate, (nch, 3, 2))
  spawn_p = jnp.asarray(BAL_SPAWN_P)
  despawn_p = jnp.asarray(BAL_DESPAWN_P)
  want_spawn = (touched[:, None]
                & (counts < jnp.trunc(tmin).astype(jnp.int32))
                & (gate[..., 0] < spawn_p))
  want_despawn = (touched[:, None] & ~want_spawn
                  & (counts > jnp.trunc(tmax).astype(jnp.int32))
                  & (gate[..., 1] < despawn_p))

  # Uniform random material cell per (chunk, class): argmax of iid uniforms
  # over the in-chunk material mask (env.py:165-170's randint pick).
  ucell = jax.random.uniform(k_cells, (3, nch, csx * csy))
  need_mat = jnp.asarray(BAL_MATERIAL)                  # (3,)
  mmatch = matv[None] == need_mat[:, None, None]        # (3, nch, cs)
  score = jnp.where(mmatch, ucell, -1.0)
  pick = jnp.argmax(score, -1)                          # (3, nch)
  pick_ok = jnp.take_along_axis(score, pick[..., None], -1)[..., 0] >= 0
  chunk_x = (jnp.arange(nch) // ncy) * csx
  chunk_y = (jnp.arange(nch) % ncy) * csy
  sp_x = chunk_x[None] + pick // csy
  sp_y = chunk_y[None] + pick % csy                     # (3, nch)
  sp_pos = jnp.stack([sp_x, sp_y], -1)                  # (3, nch, 2)
  sp_dist = jnp.abs(sp_pos - ppos).sum(-1)              # L1, objects.py:49-52
  span = jnp.asarray(BAL_SPAN)[:, None]
  spawn_ok = (want_spawn.T & pick_ok & _inside(sp_pos, cfg.area)
              & (maps.occupant(sp_pos, ent.pos, live) == 0)
              & (sp_dist >= span))                      # (3, nch)

  # Despawn: uniform random creature of the class in the chunk, removed when
  # far enough from the player (env.py:175-179).  Uniform pick = argmax of
  # iid random priorities, dense per-segment (ops/maps.py).
  prio = jax.random.randint(k_despawn, (k,), 0, 1 << 30)
  victim, best = maps.masked_argmax_per_segment(
      jnp.where(member, cid * 3 + cls, -1), prio, nch * 3, member)
  victim = victim.reshape(nch, 3)
  vx = maps.table_gather(ent.pos[:, 0], victim.reshape(-1)).reshape(nch, 3)
  vy = maps.table_gather(ent.pos[:, 1], victim.reshape(-1)).reshape(nch, 3)
  vdist = jnp.abs(vx - ppos[0]) + jnp.abs(vy - ppos[1])
  despawn_ok = (want_despawn & (victim >= 0)
                & (vdist >= jnp.asarray(BAL_DESPAN)[None, :]))

  spawn_req = dict(
      valid=spawn_ok.reshape(-1),                       # (3*nch,)
      pos=sp_pos.reshape(-1, 2),
      etype=jnp.broadcast_to(jnp.asarray(BAL_CLASSES)[:, None],
                             (3, nch)).reshape(-1))
  despawn = dict(valid=despawn_ok.reshape(-1), slot=victim.reshape(-1))
  return despawn, spawn_req


# ---------------------------------------------------------------------------
# Phase 4: unified spawn allocation into free entity slots.
# ---------------------------------------------------------------------------


def _spawn_phase(state: State, cfg: EnvConfig, plant_spawn, plant_pos,
                 arrow_req, bal_req):
  """Place all pending spawns (plant, arrows, balance mobs) atomically.

  Requests are ordered (plant, arrows by slot, balance by chunk) and claim
  cells via scatter-min so no two spawns share a cell; slots are the lowest
  free indices, mirroring the reference's append-to-list allocation
  (engine.py:50-57) up to slot reuse.
  """
  k = cfg.max_entities
  w, h = cfg.area
  ent = state.ent

  req_valid = jnp.concatenate([
      plant_spawn[None], arrow_req['valid'], bal_req['valid']])
  req_pos = jnp.concatenate([
      plant_pos[None], arrow_req['pos'], bal_req['pos']])
  req_type = jnp.concatenate([
      jnp.full((1,), rules.E_PLANT, jnp.int32),
      jnp.full((k,), rules.E_ARROW, jnp.int32),
      bal_req['etype']])
  req_facing = jnp.concatenate([
      jnp.zeros((1,), jnp.int32), arrow_req['facing'],
      jnp.zeros_like(bal_req['etype'])])
  # Cell uniqueness among requests + cell must be free right now.
  req_valid = (req_valid & _inside(req_pos, cfg.area)
               & (maps.occupant(req_pos, ent.pos, ent.etype > 0) == 0))
  req_valid = maps.claim_lowest(req_pos, req_valid)

  # Lowest free slots, assigned in request order.
  free_sorted = jnp.sort(jnp.where(ent.etype == 0, jnp.arange(k), k))
  rank = jnp.cumsum(req_valid) - 1
  slot = maps.table_gather(free_sorted, jnp.clip(rank, 0, k - 1), fill=k)
  ok = req_valid & (slot < k)
  slot = jnp.where(ok, slot, -1)

  health = maps.table_gather(jnp.asarray(TYPE_HEALTH), req_type)
  ent = ent.replace(
      etype=maps.table_scatter_set(ent.etype, slot, req_type, ok),
      pos=jnp.stack([
          maps.table_scatter_set(ent.pos[:, 0], slot, req_pos[:, 0], ok),
          maps.table_scatter_set(ent.pos[:, 1], slot, req_pos[:, 1], ok)],
          -1),
      health=maps.table_scatter_set(ent.health, slot, health, ok),
      aux=maps.table_scatter_set(ent.aux, slot, 0, ok),
      facing=maps.table_scatter_set(ent.facing, slot, req_facing, ok))
  return state.replace(ent=ent)


# ---------------------------------------------------------------------------
# The tick.
# ---------------------------------------------------------------------------


def step(state: State, action: jax.Array,
         cfg: EnvConfig = DEFAULT_CONFIG,
         balance: bool | None = None) -> Tuple[State, StepOut]:
  """One simulation tick (env.py:83-118).  Pure; jit/vmap/shard at will.

  ``balance``: None runs chunk balancing on the reference's per-env
  cadence (every 10th step of each env, env.py:90).  True/False force the
  phase on/off for this tick — the batched path (env.py:vec_step) uses a
  *global* cadence under ``lax.cond`` so 9 of 10 ticks skip the phase's
  compute entirely; since auto-resets desynchronize env-local step counts
  anyway, the cadence phase relative to episode start is the only
  (distribution-neutral) difference.
  """
  key, k_player, k_mob, k_balance = jax.random.split(state.key, 4)
  step_ = state.step + 1
  state = state.replace(step=step_, key=key)

  state, plant_spawn, plant_pos = _player_phase(state, action, k_player, cfg)
  state, arrow_req = _mob_phase(state, k_mob, cfg, plant_spawn, plant_pos)

  # Chunk balancing (env.py:90).  The phase returns masked deltas (despawn
  # slots + spawn requests) rather than a whole new state: a full-state
  # select per tick would copy ~25 KB/env/step.
  n_bal = 3 * cfg.n_chunks[0] * cfg.n_chunks[1]

  def _no_balance(state, key):
    del state, key
    return (dict(valid=jnp.zeros((n_bal,), bool),
                 slot=jnp.full((n_bal,), -1, jnp.int32)),
            dict(valid=jnp.zeros((n_bal,), bool),
                 pos=jnp.zeros((n_bal, 2), jnp.int32),
                 etype=jnp.zeros((n_bal,), jnp.int32)))

  if balance is False:
    despawn, bal_req = _no_balance(state, k_balance)
  elif balance is True:
    despawn, bal_req = _balance_phase(state, k_balance, cfg)
  else:
    # Per-env cadence (env.py:90) under a real branch: 9 of 10 ticks skip
    # the phase's compute entirely, for the single-env path too.
    despawn, bal_req = jax.lax.cond(
        (step_ % cfg.balance_every) == 0,
        lambda s, k: _balance_phase(s, k, cfg), _no_balance,
        state, k_balance)
  vok = despawn['valid']
  vslot = despawn['slot']
  state = state.replace(
      ent=state.ent.replace(
          etype=maps.table_scatter_set(state.ent.etype, vslot, 0, vok)))

  state = _spawn_phase(state, cfg, plant_spawn, plant_pos, arrow_req,
                       bal_req)

  # Rebuild the occupancy map once from the entity table (cells are unique
  # by construction); the hot path above queries occupancy via pairwise
  # position matching (ops/maps.py:occupant) and never reads obj_map.
  obj_map = maps.map_scatter(
      jnp.zeros_like(state.obj_map), state.ent.pos,
      jnp.arange(cfg.max_entities) + 1, state.ent.etype > 0)
  state = state.replace(obj_map=obj_map)

  # Track chunks that held entities (the reference's defaultdict keys,
  # engine.py:36/:57/:78-79, consumed by env.py:90-95).
  (csx, csy), (ncx, ncy) = cfg.chunk_size, cfg.n_chunks
  live = state.ent.etype > 0
  cid = jnp.where(
      live, (state.ent.pos[:, 0] // csx) * ncy + state.ent.pos[:, 1] // csy,
      -1)
  touched = (state.chunk_touched.reshape(-1)
             | (maps.table_scatter_add(ncx * ncy, cid, 1) > 0)
             ).reshape(ncx, ncy)

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
