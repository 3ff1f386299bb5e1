"""Observation rendering as texture-atlas gathers on device.

The reference composes every frame on the host with per-tile PIL blits
(reference: crafter/engine.py:155-248, crafter/env.py:120-130).  Here all
textures are baked once into dense atlases and a frame is two gathers
(material tile + entity overlay) fused with vectorized alpha blending and
the day/night lighting math — one small XLA program per env, vmappable to
thousands of frames per step on the VPU.

Pixel-parity notes:

* Texture resizing uses PIL NEAREST at bake time, exactly like the
  reference's `Textures.get` (engine.py:131-142); material id 0 renders the
  `unknown` texture (engine.py:132-133) and out-of-view-bounds tiles stay
  the 127-gray canvas (engine.py:168-173).
* PIL's `ImageEnhance.Color(x).enhance(f)` is `trunc(L + f*(x-L))` with the
  fixed-point luma `L = (19595R + 38470G + 7471B + 32768) >> 16` (verified
  empirically against PIL; see tests/test_render.py).
* The reference draws the night noise from the *game* RNG stream
  (engine.py:208-211) — the documented parity trap (SURVEY.md §3.3).  Here
  rendering is pure: the noise key is derived by folding a render tag into
  the state key, so observations never perturb the simulation.
* Intermediate float math is float32 (the reference runs numpy float64);
  uint8 truncation points are replicated, so frames match the reference to
  within ±1 LSB on lighting-blended pixels and exactly elsewhere.
"""

from __future__ import annotations

import functools
import pathlib
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import rules
from . import state as state_lib
from .config import EnvConfig
from .state import State

ASSETS = pathlib.Path(__file__).parent / 'assets'

# Entity render-texture ids (objects.py texture properties).
TEX_NONE = 0
TEX_PLAYER = 1          # +facing: left,right,up,down (objects.py:85-93)
TEX_PLAYER_SLEEP = 5
TEX_COW = 6
TEX_ZOMBIE = 7
TEX_SKELETON = 8
TEX_ARROW = 9           # +facing (objects.py:361-367)
TEX_PLANT = 13
TEX_PLANT_RIPE = 14     # objects.py:394-399
ENT_TEX_NAMES = (
    None, 'player-left', 'player-right', 'player-up', 'player-down',
    'player-sleep', 'cow', 'zombie', 'skeleton', 'arrow-left', 'arrow-right',
    'arrow-up', 'arrow-down', 'plant', 'plant-ripe')

GRAY_ID = rules.N_MATERIALS  # out-of-bounds tile: the 127-gray canvas


@struct.dataclass
class Atlas:
  """Baked textures for one (size, view) configuration (all uint8)."""

  mat: jax.Array         # (N_MATERIALS+1, ux, uy, 3) — id 0 = 'unknown'
  ent: jax.Array         # (15, ux, uy, 4) RGBA entity sprites
  item_tiles: jax.Array  # (16, 10, ux, uy, 3) — inventory tile per amount
  vignette: jax.Array    # (gh*uy, gw*ux) float32 night vignette,
  #                          stored row-major like the composed frame


def _load(name: str) -> np.ndarray:
  import imageio.v3 as iio
  img = iio.imread((ASSETS / f'{name}.png').read_bytes())
  # (x, y) axis order like the reference (engine.py:127).
  return img.transpose((1, 0) + tuple(range(2, len(img.shape))))


def _resize(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
  from PIL import Image
  # engine.py:136-141: PIL NEAREST, note the (y, x) size order.
  return np.array(Image.fromarray(img).resize(size[::-1],
                                              resample=Image.NEAREST))


def _rgb(img: np.ndarray) -> np.ndarray:
  return img[..., :3] if img.shape[-1] == 4 else img


def _draw_alpha(canvas: np.ndarray, pos, texture: np.ndarray) -> None:
  """The reference's alpha-over blit, float64 + truncation (engine.py:276-284)."""
  (x, y), (w, h) = pos, texture.shape[:2]
  if texture.shape[-1] == 4:
    alpha = texture[..., 3:].astype(np.float64) / 255
    rgb = texture[..., :3].astype(np.float64) / 255
    cur = canvas[x: x + w, y: y + h].astype(np.float64) / 255
    texture = (255 * (alpha * rgb + (1 - alpha) * cur)).astype(np.uint8)
  canvas[x: x + w, y: y + h] = texture


def _vignette(shape: Tuple[int, int], stddev: float) -> np.ndarray:
  """engine.py:213-218."""
  xs, ys = np.meshgrid(np.linspace(-1, 1, shape[0]),
                       np.linspace(-1, 1, shape[1]))
  return (1 - np.exp(-0.5 * (xs ** 2 + ys ** 2) / (stddev ** 2))).T


@functools.lru_cache(8)
def bake_atlas(size: Tuple[int, int] = (64, 64),
               view: Tuple[int, int] = (9, 9),
               item_rows: int = 2) -> Atlas:
  """Bake all textures for a render size on the host (cached)."""
  ux, uy = size[0] // view[0], size[1] // view[1]
  gw, gh = view[0], view[1] - item_rows

  mat = np.full((rules.N_MATERIALS + 1, ux, uy, 3), 127, np.uint8)
  mat[0] = _rgb(_resize(_load('unknown'), (ux, uy)))
  for name, mid in rules.MAT_ID.items():
    mat[mid] = _rgb(_resize(_load(name), (ux, uy)))
  # GRAY_ID stays 127: the canvas background for out-of-bounds tiles.

  ent = np.zeros((len(ENT_TEX_NAMES), ux, uy, 4), np.uint8)
  for i, name in enumerate(ENT_TEX_NAMES):
    if name is None:
      continue
    img = _resize(_load(name), (ux, uy))
    if img.shape[-1] == 3:
      img = np.concatenate([img, np.full(img.shape[:2] + (1,), 255,
                                         np.uint8)], -1)
    ent[i] = img

  # Inventory tiles: icon at 0.8*unit offset 0.1*unit, count digit at
  # 0.6*unit offset 0.4*unit, zero amounts blank (engine.py:227-248).
  unit = np.array([ux, uy])
  icon_size = (0.8 * unit).astype(int)
  digit_size = (0.6 * unit).astype(int)
  icon_off = (0.1 * unit).astype(int)
  digit_off = (0.4 * unit).astype(int)
  item_tiles = np.zeros((rules.N_ITEMS, 10, ux, uy, 3), np.uint8)
  for i, name in enumerate(rules.ITEMS):
    icon = _resize(_load(name), tuple(icon_size))
    for amount in range(1, 10):
      tile = np.zeros((ux, uy, 3), np.uint8)
      _draw_alpha(tile, icon_off, icon)
      digit = _resize(_load(str(amount)), tuple(digit_size))
      _draw_alpha(tile, digit_off, digit)
      item_tiles[i, amount] = tile

  # The frame is composed row-major (y, x) from the start — transposing a
  # (64, 64, 3) uint8 batch afterwards costs ~100x the whole render on TPU
  # (Mosaic relayout), so the reference's final transpose (env.py:130) is
  # baked into the composition instead.  The vignette is stored in the
  # same orientation.
  vig = _vignette((gw * ux, gh * uy), 0.5).astype(np.float32).T
  return Atlas(mat=jnp.asarray(mat), ent=jnp.asarray(ent),
               item_tiles=jnp.asarray(item_tiles),
               vignette=jnp.asarray(vig))


def _table_lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
  """Gather rows of a small table as a one-hot matmul.

  TPU lowers per-index slice gathers poorly (tens of ms for the 63
  tile-lookups of a 4096-env frame); with tables this small (≤160 rows) a
  one-hot contraction runs on the MXU instead.  uint8 texel values (≤255)
  are exact in bfloat16, and one-hot rows have a single 1, so the result
  is the exact table row.
  """
  t = table.shape[0]
  flat = table.reshape(t, -1).astype(jnp.bfloat16)
  oh = jax.nn.one_hot(ids.reshape(-1), t, dtype=jnp.bfloat16)
  out = oh @ flat
  return out.reshape(ids.shape + table.shape[1:]).astype(jnp.float32)


def _luma(rgb: jax.Array) -> jax.Array:
  """PIL's fixed-point ITU-R 601-2 luma (Convert.c L24 table)."""
  r = rgb[..., 0].astype(jnp.int32)
  g = rgb[..., 1].astype(jnp.int32)
  b = rgb[..., 2].astype(jnp.int32)
  return (19595 * r + 38470 * g + 7471 * b + 32768) >> 16


def _desaturate(canvas_u8: jax.Array, factor: float) -> jax.Array:
  """ImageEnhance.Color(x).enhance(factor): trunc(L + f*(x-L))."""
  lum = _luma(canvas_u8)[..., None].astype(jnp.float32)
  out = lum + factor * (canvas_u8.astype(jnp.float32) - lum)
  return jnp.floor(out)


def render(state: State, cfg: EnvConfig, atlas: Atlas,
           size: Tuple[int, int] = (64, 64)) -> jax.Array:
  """One frame: (size[1], size[0], 3) uint8 (env.py:120-130 transposes)."""
  gw, gh = cfg.local_grid
  item_rows = cfg.item_rows
  ux, uy = size[0] // cfg.view[0], size[1] // cfg.view[1]
  ppos = state.player.pos
  sleeping = state.player.sleeping

  # --- local view: material layer (engine.py:165-175) --------------------
  # The (gw, gh) window around the player is extracted with two tiny
  # one-hot matmuls per channel plane instead of a per-cell gather
  # (per-point gathers serialize on TPU — tens of ms per frame batch,
  # PERF.md).  Out-of-world rows/columns have empty one-hots and read 0.
  w, h = cfg.area
  off = jnp.asarray([gw // 2, gh // 2])
  xs = ppos[0] + jnp.arange(gw) - off[0]                    # (gw,)
  ys = ppos[1] + jnp.arange(gh) - off[1]                    # (gh,)
  inside = (((xs >= 0) & (xs < w))[:, None]
            & ((ys >= 0) & (ys < h))[None, :])              # (gw, gh)
  ohx = (xs[:, None] == jnp.arange(w)).astype(jnp.float32)  # (gw, W)
  ohy = (jnp.arange(h)[:, None] == ys[None]).astype(jnp.float32)  # (H, gh)

  def window(plane):
    g = plane.reshape(w, h).astype(jnp.float32)
    return (ohx @ g @ ohy).astype(jnp.int32)                # (gw, gh)

  mids = jnp.where(inside, window(state.mat_map), GRAY_ID)
  tiles = _table_lookup(atlas.mat, mids)                    # (gw,gh,ux,uy,3)

  # --- entity overlay (engine.py:176-181): entities live in the grid, so
  # the occupant's sprite id is a per-tile select over the channel windows,
  # replacing the reference's per-object blits.
  et = window(state.ent.etype)
  aux = window(state.ent.aux)
  fac = window(state.ent.facing)
  texid_grid = jnp.where(
      et == rules.E_PLAYER,
      jnp.where(sleeping, TEX_PLAYER_SLEEP, TEX_PLAYER + state.player.facing),
      jnp.where(et == rules.E_COW, TEX_COW,
                jnp.where(et == rules.E_ZOMBIE, TEX_ZOMBIE,
                          jnp.where(et == rules.E_SKELETON, TEX_SKELETON,
                                    jnp.where(et == rules.E_ARROW,
                                              TEX_ARROW + fac,
                                              jnp.where(et == rules.E_PLANT,
                                                        jnp.where(aux > 300,
                                                                  TEX_PLANT_RIPE,
                                                                  TEX_PLANT),
                                                        TEX_NONE))))))
  sprite = _table_lookup(atlas.ent, texid_grid)             # (gw,gh,ux,uy,4)
  alpha = sprite[..., 3:] / 255.0
  blended = alpha * (sprite[..., :3] / 255.0) + (1 - alpha) * (tiles / 255.0)
  tiles = jnp.floor(255.0 * blended)  # engine.py:283 truncation

  # Row-major composition: (gh, uy, gw, ux, 3) -> (gh*uy, gw*ux, 3).
  canvas = tiles.transpose(1, 3, 0, 2, 4).reshape(gh * uy, gw * ux, 3)

  # --- lighting (engine.py:182-218) --------------------------------------
  daylight = state_lib.daylight(state.step, cfg.day_length)
  nkey = jax.random.fold_in(jax.random.fold_in(state.key, 0x9e77), state.step)
  noise = jax.random.uniform(nkey, canvas.shape[:2], jnp.float32, 32., 127.)
  amount = 2.0 * (0.5 - daylight)
  mask = (amount * atlas.vignette)[..., None]
  noised = (1 - mask) * canvas + mask * noise[..., None]
  night = jnp.where(daylight < 0.5, noised, canvas)
  night = _desaturate(jnp.floor(night).astype(jnp.uint8), 0.4)
  night = 0.5 * night + 0.5 * jnp.asarray([0., 16., 64.])  # _tint engine.py:195
  lit = daylight * canvas + (1 - daylight) * night

  sleep_gray = _luma(jnp.floor(lit).astype(jnp.uint8))[..., None]
  sleep = 0.5 * sleep_gray + 0.5 * jnp.asarray([0., 0., 16.])
  canvas = jnp.where(sleeping, sleep, lit)

  # --- item strip (engine.py:227-248) ------------------------------------
  amounts = jnp.clip(state.player.inventory, 0, 9)
  flat_ids = jnp.arange(rules.N_ITEMS) * 10 + amounts
  itiles = _table_lookup(
      atlas.item_tiles.reshape((-1,) + atlas.item_tiles.shape[2:]),
      flat_ids).astype(jnp.uint8)
  pad = gw * item_rows - rules.N_ITEMS
  itiles = jnp.concatenate(
      [itiles, jnp.zeros((pad,) + itiles.shape[1:], itiles.dtype)])
  # index -> (col = idx % gw, row = idx // gw) (engine.py:238), composed
  # row-major: (rows, uy, gw, ux, 3) -> (rows*uy, gw*ux, 3).
  strip = (itiles.reshape(item_rows, gw, ux, uy, 3)
           .transpose(0, 3, 1, 2, 4).reshape(item_rows * uy, gw * ux, 3))

  view = jnp.concatenate([canvas, strip.astype(jnp.float32)], 0)
  view = jnp.floor(view).astype(jnp.uint8)  # env.py:129 uint8 assignment

  # --- center on the output canvas (env.py:123-130); composition is
  # already row-major so no final transpose is needed.
  w, hgt = size
  bx = (w - (w // cfg.view[0]) * cfg.view[0]) // 2
  by = (hgt - (hgt // cfg.view[1]) * cfg.view[1]) // 2
  out = jnp.zeros((hgt, w, 3), jnp.uint8)
  return jax.lax.dynamic_update_slice(out, view, (by, bx, 0))


def semantic_view(state: State, cfg: EnvConfig) -> jax.Array:
  """info['semantic'] (engine.py:251-264)."""
  return state_lib.semantic_view(state, cfg)
