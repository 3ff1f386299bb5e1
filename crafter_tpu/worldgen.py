"""Procedural world generation as one fused device kernel.

The reference walks the 64×64 grid twice in Python, calling OpenSimplex and
``RandomState.uniform`` per cell (reference: crafter/worldgen.py:10-76).
Here all noise channels for all cells are evaluated in a single batched
``noise3`` call, the material decision cascade becomes a chain of vectorized
selects, and mob seeding becomes a masked prefix-sum allocation into the
fixed-capacity entity table.  The whole thing is jittable and vmappable, so
resets of thousands of envs fuse into one XLA program.

Random draws: the reference consumes MT19937 uniforms lazily inside its
if-cascades.  Each draw is used at most once, so drawing a fresh independent
uniform per cell per decision (threefry) yields the identical joint
distribution; only the bitstream differs (bit-parity with RandomState is a
separate, non-goal here — see README).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import rules
from . import state as state_lib
from .config import EnvConfig
from .ops import noise


def _noise_channels(xy: jax.Array, perm: jax.Array,
                    mode: str = 'compat') -> dict:
  """All 11 noise channels used by the material pass (worldgen.py:21-61).

  One fused noise call over the stacked (13, W, H) point set — cheaper than
  13 kernel launches and lets XLA tile the whole thing.  `perm` is the
  permutation table in 'compat' mode or an int32 seed in 'fast' mode
  (see ops/noise.py:noise3_fast).
  """
  x = xy[..., 0].astype(jnp.float32)
  y = xy[..., 1].astype(jnp.float32)

  # (scaled_x, scaled_y, z) per channel; z selects the feature
  # (crafter/worldgen.py:79-91) and is a small integer constant.
  channels = [
      (x / 3, y / 3, 8),       # start (worldgen.py:26)
      (x / 15, y / 15, 3),     # water octave 15 (:28)
      (x / 5, y / 5, 3),       # water octave 5 (:28)
      (x / 15, y / 15, 0),     # mountain octave 15 (:30)
      (x / 5, y / 5, 0),       # mountain octave 5 (:30)
      (x / 7, y / 7, 6),       # caves (:35)
      (2 * x / 3, y / 15, 7),  # horizontal tunnels (:37)
      (x / 15, 2 * y / 3, 7),  # vertical tunnels (:40)
      (x / 8, y / 8, 1),       # coal (:43)
      (x / 6, y / 6, 2),       # iron (:45)
      (x / 5, y / 5, 6),       # lava (:49)
      (x / 9, y / 9, 4),       # sand (:53)
      (x / 7, y / 7, 5),       # trees (:58)
  ]
  if mode in ('fast', 'pallas'):
    # The distribution-level path evaluates the 2-D lattice with z folded
    # into a per-channel seed — ~4x fewer ops than the 26-candidate 3-D
    # superset for a field with the same spectral character (see
    # ops/noise.py:noise2_fast).  Channels sharing (scale, z) pairs differ
    # by z so the folded seeds keep them independent.
    points = jnp.stack([jnp.stack([cx, cy], -1) for cx, cy, _ in channels])
    zs = jnp.asarray([z for _, _, z in channels], jnp.int32)
    seeds = (jnp.asarray(perm, jnp.int32)
             + zs * jnp.int32(np.uint32(0x9E3779B9).view(np.int32)))
    seeds = seeds.reshape((len(channels),) + (1,) * (points.ndim - 2))
    if mode == 'pallas':
      from .ops.noise_pallas import noise2_pallas
      n = noise2_pallas(points, seeds)
    else:
      n = noise.noise2_fast(points, seeds)
  else:
    points = jnp.stack([
        jnp.stack([cx, cy, jnp.full_like(cx, z)], -1)
        for cx, cy, z in channels])  # (13, W, H, 3)
    n = noise.noise3(points, perm)
  return dict(
      start=n[0],
      water=n[1] + 0.15 * n[2],           # normalize=False (:28)
      mountain=(n[3] + 0.3 * n[4]) / 1.3,  # normalized (:30)
      cave=n[5], htunnel=n[6], vtunnel=n[7], coal=n[8], iron=n[9],
      lava=n[10], sand=n[11], tree=n[12],
  )


def generate_world(key: jax.Array, cfg: EnvConfig) -> state_lib.State:
  """Fresh world: terrain + seeded mobs + player at center (env.py:70-81)."""
  w, h = cfg.area
  cx, cy = cfg.center
  tables = rules.TABLES

  k_perm, k_mat, k_obj = jax.random.split(key, 3)
  mode = cfg.noise_mode
  if mode == 'auto':
    mode = 'pallas' if jax.default_backend() == 'tpu' else 'fast'
  if mode in ('fast', 'pallas'):
    perm = jax.random.randint(k_perm, (), 0, 2 ** 31 - 1)  # int seed
  else:
    perm = noise.perm_from_key(k_perm)

  xs = jnp.arange(w, dtype=jnp.int32)
  ys = jnp.arange(h, dtype=jnp.int32)
  xy = jnp.stack(jnp.meshgrid(xs, ys, indexing='ij'), -1)  # (W, H, 2)
  n = _noise_channels(xy, perm, mode)

  # --- material pass (worldgen.py:21-61) -------------------------------
  dist = jnp.sqrt(((xy - jnp.asarray([cx, cy])) ** 2)
                  .sum(-1).astype(jnp.float32))
  start = 4.0 - dist + 2.0 * n['start']
  start = jax.nn.sigmoid(start)                       # (:25-27)
  water = n['water'] + 0.1 - 2.0 * start              # (:28-29)
  mountain = n['mountain'] - 4.0 * start - 0.3 * water  # (:30-31)

  u = jax.random.uniform(k_mat, (4, w, h))  # coal, iron, diamond, tree draws

  is_start = start > 0.5
  in_mtn = ~is_start & (mountain > 0.15)
  cave = in_mtn & (n['cave'] > 0.15) & (mountain > 0.3)        # (:35-36)
  htun = in_mtn & ~cave & (n['htunnel'] > 0.4)                 # (:37-39)
  vtun = in_mtn & ~cave & ~htun & (n['vtunnel'] > 0.4)         # (:40-42)
  taken = cave | htun | vtun
  coal = in_mtn & ~taken & (n['coal'] > 0) & (u[0] > 0.85)     # (:43-44)
  taken |= coal
  iron = in_mtn & ~taken & (n['iron'] > 0.4) & (u[1] > 0.75)   # (:45-46)
  taken |= iron
  diamond = in_mtn & ~taken & (mountain > 0.18) & (u[2] > 0.994)  # (:47-48)
  taken |= diamond
  lava = in_mtn & ~taken & (mountain > 0.3) & (n['lava'] > 0.35)  # (:49-50)
  stone = in_mtn & ~taken & ~lava                              # (:51-52)
  lowland = ~is_start & ~in_mtn
  sand = lowland & (0.25 < water) & (water <= 0.35) & (n['sand'] > -0.2)
  watr = lowland & ~sand & (water > 0.3)                       # (:55-56)
  grassland = lowland & ~sand & ~watr
  tree = grassland & (n['tree'] > 0) & (u[3] > 0.8)            # (:58-59)

  mat = jnp.full((w, h), rules.MAT_GRASS, jnp.uint8)
  for mask, mid in [
      (cave | htun | vtun, rules.MAT_PATH), (coal, rules.MAT_COAL),
      (iron, rules.MAT_IRON), (diamond, rules.MAT_DIAMOND),
      (lava, rules.MAT_LAVA), (stone, rules.MAT_STONE),
      (sand, rules.MAT_SAND), (watr, rules.MAT_WATER),
      (tree, rules.MAT_TREE)]:
    mat = jnp.where(mask, jnp.uint8(mid), mat)
  tunnels = htun | vtun

  # --- object pass (worldgen.py:64-76): entities are per-cell channels ---
  uo = jax.random.uniform(k_obj, (3, w, h))
  walkable = _mat_in(mat, tables.walkable_mob)
  cow = (walkable & (dist > 3) & (mat == rules.MAT_GRASS)
         & (uo[0] > 0.985))                                    # (:71-72)
  zombie = walkable & ~cow & (dist > 10) & (uo[1] > 0.993)     # (:73-74)
  skeleton = (walkable & ~cow & ~zombie & (mat == rules.MAT_PATH)
              & tunnels & (uo[2] > 0.95))                      # (:75-76)
  etype = jnp.where(
      cow, rules.E_COW,
      jnp.where(zombie, rules.E_ZOMBIE,
                jnp.where(skeleton, rules.E_SKELETON, rules.E_NONE)))
  # Player spawns at the center, added before worldgen in the reference
  # (env.py:71,76-78); worldgen spawn rules exclude the center anyway
  # (cow dist>3, zombie dist>10, skeleton needs a tunnel).
  etype = etype.at[cx, cy].set(rules.E_PLAYER)
  # cow 3 (objects.py:267), zombie 5 (:286), skeleton 3 (:319)
  health = jnp.where(
      etype == rules.E_COW, 3,
      jnp.where(etype == rules.E_ZOMBIE, 5,
                jnp.where(etype == rules.E_SKELETON, 3, 0)))
  ent = state_lib.EntMaps(
      etype=etype.astype(jnp.uint8).reshape(-1),
      health=health.astype(jnp.uint8).reshape(-1),
      aux=jnp.zeros((w * h,), jnp.int16),
      facing=jnp.zeros((w * h,), jnp.uint8))

  # Chunks that start with an object in them (engine.py:57 via defaultdict).
  (csx, csy), (ncx, ncy) = cfg.chunk_size, cfg.n_chunks
  padded = jnp.zeros((ncx * csx, ncy * csy), bool)
  padded = padded.at[:w, :h].set(etype > 0)
  chunk_touched = (padded.reshape(ncx, csx, ncy, csy)
                   .transpose(0, 2, 1, 3).reshape(ncx, ncy, -1).any(-1))

  player = state_lib.init_player(cfg)
  return state_lib.State(
      mat_map=mat.reshape(-1), ent=ent, player=player,
      step=jnp.int32(0), key=jax.random.fold_in(key, 0x5eed),
      unlocked=jnp.zeros((rules.N_ACHIEVEMENTS,), bool),
      env_last_health=jnp.int32(tables.item_initial[rules.ITEM_HEALTH]),
      chunk_touched=chunk_touched,
  )


def _mat_in(m: jax.Array, member_table) -> jax.Array:
  """Per-cell material-set membership as a fused compare chain."""
  out = jnp.zeros(m.shape, bool)
  for i in np.flatnonzero(np.asarray(member_table)):
    out = out | (m == np.uint8(i))
  return out
