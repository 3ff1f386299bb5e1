"""Observation rendering as a packed-plane select kernel on device.

The reference composes every frame on the host with per-tile PIL blits
(reference: crafter/engine.py:155-248, crafter/env.py:120-130).  Here the
frame pipeline is factored for the TPU's memory hierarchy:

* **Bake time** (host, once per render size): every per-pixel quantity
  that depends only on *pixel position* is precomputed into full-frame
  planes — for each of the 14 material/amount candidates a packed-RGB
  plane holding "this pixel's texel if its tile had that id", likewise 15
  packed-RGBA sprite planes, the night vignette, and a 0/1 expansion
  matrix mapping the 63 view tiles + 16 inventory slots onto pixels.
* **Frame time**: per frame only 79 dynamic values exist (63 window-tile
  ids + 16 inventory amounts) plus four scalars (daylight, sleeping,
  facing, noise seed).  A frame is then ONE tiny matmul (79 -> pixels,
  exact: each pixel reads one source) followed by a branch-free chain of
  candidate selects and the lighting math over per-channel pixel planes,
  packed r|g<<8|b<<16 into one int32 lane per pixel.

Two backends share the same ``_render_core`` trace, so results are
bit-identical (the `_mob_core` pattern, step.py):

* jnp — per-frame under vmap (CPU, the single-env path);
* Pallas (:func:`render_frames`) — frames gridded over blocks, every
  intermediate in VMEM.  The XLA formulation of the same math (gathers +
  f32 tile tensors) materializes ~15 multi-hundred-MB intermediates per
  4096-frame batch to HBM and runs ~50x slower than the VPU roofline.

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
  rendering is pure: the per-pixel noise comes from a counter hash of
  (episode key, step, pixel), so observations never perturb the simulation
  (distribution-equivalent; tests/test_render.py::test_night_frame_statistics).
* Intermediate float math is float32 (the reference runs numpy float64);
  uint8 truncation points are replicated, so frames match the reference to
  within ±1 LSB on lighting-blended pixels and exactly elsewhere.
"""

from __future__ import annotations

import functools
import pathlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import rules
from . import state as state_lib
from .config import EnvConfig
from .state import State
from .step import _fmix, _i32c, _lane_iota, _srl

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
  """Baked per-pixel planes for one (size, view) configuration.

  ``C`` = size[0] * size[1] output pixels, lane l = row * size[0] + col of
  the (size[1], size[0], 3) frame.  View borders (env.py:123-125) are
  baked into the plane layout.
  """

  mat_planes: jax.Array  # (N_MATERIALS+1, C) int32 r|g<<8|b<<16 — candidate
  #                        k's texel: material k in the view region, item
  #                        amount k (k<10) in the strip region
  spr_planes: jax.Array  # (15, C) int32 r|g<<8|b<<16|a<<24 sprite texels
  expand: jax.Array      # (79, C) int8 0/1: view tile / item slot -> pixel
  vignette: jax.Array    # (1, C) float32 night vignette (0 off the view)
  view_mask: jax.Array   # (1, C) int32 0/1 — pixels the lighting applies to


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
  """Bake the per-pixel candidate planes for a render size (cached)."""
  ux, uy = size[0] // view[0], size[1] // view[1]
  gw, gh = view[0], view[1] - item_rows
  wpix, hpix = size
  c = wpix * hpix
  # View border (env.py:123-125): bx along the minor (col) axis, by rows.
  bx = (wpix - ux * view[0]) // 2
  by = (hpix - uy * view[1]) // 2
  n_mat = rules.N_MATERIALS + 1  # + the 127-gray out-of-bounds candidate

  mat_tex = np.full((n_mat, ux, uy, 3), 127, np.uint8)
  mat_tex[0] = _rgb(_resize(_load('unknown'), (ux, uy)))
  for name, mid in rules.MAT_ID.items():
    mat_tex[mid] = _rgb(_resize(_load(name), (ux, uy)))
  # GRAY_ID stays 127: the canvas background for out-of-bounds tiles.

  spr_tex = np.zeros((len(ENT_TEX_NAMES), ux, uy, 4), np.uint8)
  for i, name in enumerate(ENT_TEX_NAMES):
    if name is None:
      continue
    img = _resize(_load(name), (ux, uy))
    if img.shape[-1] == 3:
      img = np.concatenate([img, np.full(img.shape[:2] + (1,), 255,
                                         np.uint8)], -1)
    spr_tex[i] = img

  # Inventory tiles: icon at 0.8*unit offset 0.1*unit, count digit at
  # 0.6*unit offset 0.4*unit, zero amounts blank (engine.py:227-248).
  unit = np.array([ux, uy])
  item_tiles = np.zeros((rules.N_ITEMS, 10, ux, uy, 3), np.uint8)
  for i, name in enumerate(rules.ITEMS):
    icon = _resize(_load(name), tuple((0.8 * unit).astype(int)))
    for amount in range(1, 10):
      tile = np.zeros((ux, uy, 3), np.uint8)
      _draw_alpha(tile, (0.1 * unit).astype(int), icon)
      digit = _resize(_load(str(amount)), tuple((0.6 * unit).astype(int)))
      _draw_alpha(tile, (0.4 * unit).astype(int), digit)
      item_tiles[i, amount] = tile

  # Per-pixel planes, row-major (y, x) like the output frame — the
  # reference's final transpose (env.py:130) is baked into the layout
  # (a post-hoc uint8 transpose is a catastrophic Mosaic relayout,
  # PERF.md).  Row r, col cc -> lane r*wpix + cc.
  ys, xs = np.divmod(np.arange(c), wpix)     # ys = row, xs = col
  r_view = ys - by
  c_view = xs - bx
  in_view = ((r_view >= 0) & (r_view < gh * uy)
             & (c_view >= 0) & (c_view < gw * ux))
  r_strip = r_view - gh * uy
  in_strip = ((r_strip >= 0) & (r_strip < item_rows * uy)
              & (c_view >= 0) & (c_view < gw * ux))
  tx = np.clip(c_view // ux, 0, gw - 1)
  ty = np.clip(r_view // uy, 0, gh - 1)
  px = np.clip(c_view % ux, 0, ux - 1)
  py_v = np.clip(r_view % uy, 0, uy - 1)
  py_s = np.clip(r_strip % uy, 0, uy - 1)
  item = np.clip(r_strip // uy, 0, item_rows - 1) * gw + tx  # engine.py:238
  item_ok = in_strip & (item < rules.N_ITEMS)

  pk3 = lambda t: (t[..., 0].astype(np.int64) | (t[..., 1].astype(np.int64)
                   << 8) | (t[..., 2].astype(np.int64) << 16))
  mat_planes = np.zeros((n_mat, c), np.int64)
  for k in range(n_mat):
    mat_planes[k][in_view] = pk3(mat_tex[k][px, py_v])[in_view]
    if k < 10:
      mat_planes[k][item_ok] = pk3(
          item_tiles[np.clip(item, 0, rules.N_ITEMS - 1), k, px, py_s]
      )[item_ok]
  spr_planes = np.zeros((len(ENT_TEX_NAMES), c), np.int64)
  for k in range(1, len(ENT_TEX_NAMES)):
    spr_planes[k][in_view] = (
        pk3(spr_tex[k][px, py_v])
        | (spr_tex[k][px, py_v, 3].astype(np.int64) << 24))[in_view]

  # Expansion matrix: pixel <- its view tile (x-major, matching the
  # window flatten order) or its strip item slot.
  expand = np.zeros((gw * gh + rules.N_ITEMS, c), np.float32)
  lanes = np.arange(c)
  src = np.where(in_view, tx * gh + ty,
                 np.where(item_ok, gw * gh + item, -1))
  ok = src >= 0
  expand[src[ok], lanes[ok]] = 1.0

  vig = np.zeros((c,), np.float32)
  vig_view = _vignette((gw * ux, gh * uy), 0.5).astype(np.float32).T
  vig[in_view] = vig_view[r_view[in_view], c_view[in_view]]

  i32 = lambda a: jnp.asarray(
      (a & 0xFFFFFFFF).astype(np.uint32).view(np.int32))
  return Atlas(
      mat_planes=i32(mat_planes),
      spr_planes=i32(spr_planes),
      # int8 storage: the expansion matrix is the render kernel's largest
      # resident table; narrow HBM/VMEM traffic, cast at use.
      expand=jnp.asarray(expand.astype(np.int8)),
      vignette=jnp.asarray(vig.reshape(1, c)),
      view_mask=jnp.asarray(in_view.astype(np.int32).reshape(1, c)))


def _luma_i(r: jax.Array, g: jax.Array, b: jax.Array) -> jax.Array:
  """PIL's fixed-point ITU-R 601-2 luma (Convert.c L24 table), int32 in."""
  return (19595 * r + 38470 * g + 7471 * b + 32768) >> 16


def _noise_seed(key: jax.Array, step: jax.Array) -> jax.Array:
  """Per-(episode, step) int32 seed for the night-noise hash."""
  ki = jax.lax.bitcast_convert_type(jax.random.key_data(key), jnp.int32)
  return _fmix(ki[..., 0] ^ _fmix(ki[..., 1] + step * _i32c(0x9E3779B9))
               + _i32c(0x51ED2701))


def pack_cells(mat_map, ent_etype, ent_aux, ent_facing) -> jax.Array:
  """Per-cell channels -> the packed render plane: material id (4 bits)
  | cell sprite id (4 bits).  The sprite id is the final texture id for
  every entity type except the player, whose tile carries the marker
  TEX_PLAYER and is resolved against facing/sleeping in
  :func:`_window_prep`.  Matches the group kernel's snapshot packing
  (step.py:step_group_batch)."""
  t = ent_etype.astype(jnp.int32)
  f = ent_facing.astype(jnp.int32)
  ripe = ((t == rules.E_PLANT)
          & (ent_aux.astype(jnp.int32) > 300)).astype(jnp.int32)
  ctex = jnp.where(
      t == rules.E_PLAYER, TEX_PLAYER,
      jnp.where(t == rules.E_COW, TEX_COW,
                jnp.where(t == rules.E_ZOMBIE, TEX_ZOMBIE,
                          jnp.where(t == rules.E_SKELETON, TEX_SKELETON,
                                    jnp.where(t == rules.E_ARROW,
                                              TEX_ARROW + f,
                                              jnp.where(t == rules.E_PLANT,
                                                        TEX_PLANT + ripe,
                                                        TEX_NONE))))))
  return (mat_map.astype(jnp.int32) | (ctex << 4)).astype(jnp.uint8)


def _window_prep(packed: jax.Array, ppos: jax.Array, pfacing: jax.Array,
                 sleeping: jax.Array, inventory: jax.Array,
                 cfg: EnvConfig) -> jax.Array:
  """One frame's 79 dynamic values: 63 window tile ids | texids + 16
  inventory amounts (engine.py:165-181, :227-235).

  The (gw, gh) window around the player is extracted from the packed cell
  plane with two tiny one-hot matmuls (per-point gathers serialize on
  TPU, PERF.md); out-of-world tiles read the 127-gray candidate.
  """
  gw, gh = cfg.local_grid
  w, h = cfg.area
  off = jnp.asarray([gw // 2, gh // 2])
  xs = ppos[0] + jnp.arange(gw) - off[0]                    # (gw,)
  ys = ppos[1] + jnp.arange(gh) - off[1]                    # (gh,)
  inside = (((xs >= 0) & (xs < w))[:, None]
            & ((ys >= 0) & (ys < h))[None, :])              # (gw, gh)
  # bfloat16 one-hots, column contraction first: packed values are < 256
  # so bf16 is exact, 2x the MXU rate of f32, and the (W, H) @ (H, gh)
  # order does ~25% fewer MACs than rows-first (measured ~20% faster
  # prep over a 40960-frame batch).
  ohx = (xs[:, None] == jnp.arange(w)).astype(jnp.bfloat16)  # (gw, W)
  ohy = (jnp.arange(h)[:, None] == ys[None]).astype(jnp.bfloat16)  # (H, gh)
  g = packed.reshape(w, h).astype(jnp.bfloat16)
  win = (ohx @ (g @ ohy)).astype(jnp.int32)                 # (gw, gh)

  mid = jnp.where(inside, win & 15, GRAY_ID)
  ctex = jnp.where(inside, (win >> 4) & 15, 0)
  # The player tile carries the TEX_PLAYER marker; resolve it against
  # facing/sleeping (objects.py:85-93).  Every other sprite id is final.
  ptex = jnp.where(sleeping, TEX_PLAYER_SLEEP, TEX_PLAYER + pfacing)
  texid = jnp.where(ctex == TEX_PLAYER, ptex, ctex)
  win79 = jnp.concatenate([
      (mid | (texid << 4)).reshape(gw * gh),
      jnp.clip(inventory.astype(jnp.int32), 0, 9)])
  return win79


def _render_core(win79, daylight, sleeping, seed, mats, sprs, expand, vig,
                 vmask):
  """Frame synthesis on flat pixel lanes (last axis = C) — backend-shared.

  ``win79`` (.., 79) int32; ``daylight`` (.., 1) float32; ``sleeping``/
  ``seed`` (.., 1) int32; tables per :class:`Atlas`.  Returns (.., C)
  int32 packed r|g<<8|b<<16.

  Every arithmetic step replicates the reference's order and truncation
  points (engine.py:182-218, :276-284, env.py:120-130); both backends run
  this exact trace, so jnp and Pallas frames are bit-identical.
  """
  f32 = jnp.float32
  nsel = mats.shape[0]
  # One exact matmul: each pixel column of `expand` has exactly one 1, so
  # the product is a plain copy of its source value (<= 255) — exact in
  # any matmul precision.
  ids = jnp.dot(win79.astype(f32), expand.astype(f32),
                preferred_element_type=f32).astype(jnp.int32)
  mid = ids & 15
  tex = _srl(ids, 4) & 15

  base = jnp.zeros_like(ids)
  for k in range(nsel):
    base = jnp.where(mid == k, mats[k], base)
  spr = jnp.zeros_like(ids)
  for k in range(1, sprs.shape[0]):
    spr = jnp.where(tex == k, sprs[k], spr)
  un3 = lambda v: (v & 255, _srl(v, 8) & 255, _srl(v, 16) & 255)
  b3 = un3(base)
  s3 = un3(spr)
  alpha = _srl(spr, 24) & 255

  # Alpha-over blit with the reference's truncation (engine.py:276-284):
  # floor((a*s + (255-a)*b) / 255), computed in exact int32 via
  # multiply-shift division ((n * 32897) >> 23 == n // 255 for all
  # n <= 65025) — identical to the reference's float64 path.  A float
  # formulation is NOT backend-stable: Mosaic lowers x/255 as a
  # reciprocal multiply, flooring exact-integer results one short of
  # XLA:TPU (caught by the hardware lane, tests/test_tpu.py).
  canv = [(((alpha * s + (255 - alpha) * b) * 32897) >> 23).astype(f32)
          for s, b in zip(s3, b3)]

  # Night lighting (engine.py:189-196).  mask == 0 at daylight >= 0.5, so
  # the noised canvas equals the canvas exactly — no branch needed.
  lane = _lane_iota(vig.shape[-1], ids)
  nbits = _fmix(seed + lane * _i32c(0x9E3779B9))
  noise = 32.0 + _srl(nbits, 8).astype(f32) * (95.0 / (1 << 24))
  mask = jnp.maximum(0.0, 2.0 * (0.5 - daylight)) * vig
  noised = [(1.0 - mask) * ch + mask * noise for ch in canv]
  nf = [jnp.floor(ch).astype(jnp.int32) for ch in noised]
  lum = _luma_i(*nf).astype(f32)
  desat = [jnp.floor(lum + 0.4 * (ch.astype(f32) - lum)) for ch in nf]
  tint = (0.0, 16.0, 64.0)                                # engine.py:195
  night = [0.5 * d + 0.5 * t for d, t in zip(desat, tint)]
  lit = [daylight * ch + (1.0 - daylight) * ng
         for ch, ng in zip(canv, night)]

  # Sleep overlay (engine.py:198-202).
  lf = [jnp.floor(ch).astype(jnp.int32) for ch in lit]
  lum2 = _luma_i(*lf).astype(f32)
  stint = (0.0, 0.0, 16.0)
  slp = sleeping != 0
  out = [jnp.where(slp, 0.5 * lum2 + 0.5 * t, ch)
         for ch, t in zip(lit, stint)]
  # Lighting covers the local view only; the item strip and dead border
  # keep their raw texels (env.py:126-129 concatenates them unlit).
  out = [jnp.floor(jnp.where(vmask != 0, o, ch)).astype(jnp.int32)
         for o, ch in zip(out, canv)]
  return out[0] | (out[1] << 8) | (out[2] << 16)


@functools.lru_cache(8)
def _gather_ladder_masks(c: int) -> Tuple[Tuple[np.ndarray, ...], int]:
  """Static routing masks for the lane-roll gather x[j] <- px[a(j)],
  a(j) = j + j//3 (identity beyond 3c/4).

  A per-lane variable shift cannot use naive bit masks — after one
  stage the data has moved, so bit_k(shift) read at the destination no
  longer describes the residual shift of what sits there.  Instead the
  masks are derived by destination pullback, largest roll chosen first:
  m for roll 2^k is [residual >= 2^k], then the residual targets are
  pulled back through that stage's source map.  For a MONOTONE shift
  (ours: j//3) every such mask is a step function, so two lanes never
  pull the same source with different targets — the routing is
  conflict-free (asserted below by simulation).  Returns masks in
  APPLICATION order (smallest roll first).
  """
  cw = 3 * c // 4
  lanes = np.arange(c)
  a = lanes + lanes // 3
  a[cw:] = lanes[cw:]                   # padding lanes route identity
  n_stages = max(1, int((a - lanes).max()).bit_length())
  targets = a.copy()
  masks = [None] * n_stages
  for k in range(n_stages - 1, -1, -1):  # derive last-applied first
    m = (targets - lanes) >= (1 << k)
    masks[k] = m
    jp = lanes + (1 << k) * m
    t_new = lanes.copy()
    # Used (shifting) lanes written last so a colliding identity write
    # from a padding lane cannot clobber a routed target.
    t_new[jp[~m]] = targets[~m]
    t_new[jp[m]] = targets[m]
    targets = t_new
  # Verify the network end-to-end: applying stages smallest-first must
  # realize exactly a(j).
  content = np.arange(c)
  for k in range(n_stages):
    content = np.where(masks[k], content[(lanes + (1 << k)) % c], content)
  assert (content[:cw] == a[:cw]).all(), 'ladder routing failed'
  return tuple(m for m in masks), n_stages


def _compact_words(px: jax.Array, masks: jax.Array) -> jax.Array:
  """(.., C) int32 r|g<<8|b<<16 lanes -> (.., 3C/4) int32 holding the
  frame's NHWC uint8 byte stream (little-endian) — in-kernel.

  Word j of a 4-pixel group packs bytes from pixels a(j) = j + j//3 and
  a(j)+1.  The variable per-lane gather runs as a ladder of uniform
  lane rolls + selects with statically derived routing masks
  (:func:`_gather_ladder_masks`, passed in as the (n_stages, C) int32
  ``masks`` operand — Pallas kernels cannot capture array constants;
  Mosaic lowers jnp.roll to the native lane rotate, PERF.md), so no
  strided lane access or relayout ever materializes — the XLA
  formulations of this byte compaction measured catastrophically
  (PERF.md dead-end ledger).  ``a1`` rides a second ladder copy: a(j)
  skips lane 4g+3 at every group boundary, so it is not a roll of
  ``a0``.  Integer-exact: output bytes are identical to the
  bitcast+slice of ``px``.
  """
  c = px.shape[-1]
  assert c % 4 == 0, c
  cw = 3 * c // 4
  n_stages = masks.shape[0]
  j = _lane_iota(c, px)
  x = px
  q = jnp.roll(px, -1, axis=-1)
  for k in range(n_stages):
    bit = masks[k:k + 1] != 0
    x = jnp.where(bit, jnp.roll(x, -(1 << k), axis=-1), x)
    q = jnp.where(bit, jnp.roll(q, -(1 << k), axis=-1), q)
  a0 = x
  a1 = q
  m = j % 3
  w0 = a0 | (a1 << 24)
  w1 = _srl(a0, 8) | (a1 << 16)
  w2 = _srl(a0, 16) | (a1 << 8)
  w = jnp.where(m == 0, w0, jnp.where(m == 1, w1, w2))
  return w[..., :cw]


def _image_from_words(words: jax.Array, size: Tuple[int, int]) -> jax.Array:
  """(.., 3C/4) int32 byte-stream words -> (.., H, W, 3) uint8: pure
  bitcast + reshape (the bytes are already in output order)."""
  b = jax.lax.bitcast_convert_type(words, jnp.uint8)   # (.., 3C/4, 4)
  return b.reshape(words.shape[:-1] + (size[1], size[0], 3))


def _frame_image(packed_px: jax.Array, size: Tuple[int, int]) -> jax.Array:
  """(.., C) int32 packed RGB -> (.., size[1], size[0], 3) uint8.

  Byte 0 of the little-endian int32 is R, so a bitcast view plus a 4->3
  channel slice is the whole unpack (no per-channel transpose).  An
  int32 word-compaction alternative (pack each 4-pixel group's RGB bytes
  into 3 int32 words so the final bitcast is layout-only) measured ~18
  ms/group SLOWER on TPU — the stride-4 minor-dim extracts and the
  3-way interleave are each full relayouts (tools/bench_unpack.py,
  bench r5: pixel 668k -> 367k steps/s).  The u8 slice stays.
  """
  b = jax.lax.bitcast_convert_type(packed_px, jnp.uint8)   # (.., C, 4)
  return b[..., :3].reshape(packed_px.shape[:-1] + (size[1], size[0], 3))


def render(state: State, cfg: EnvConfig, atlas: Atlas,
           size: Tuple[int, int] = (64, 64)) -> jax.Array:
  """One frame: (size[1], size[0], 3) uint8 (env.py:120-130 transposes)."""
  return render_fields(
      state.mat_map, state.ent.etype, state.ent.aux, state.ent.facing,
      state.player.pos, state.player.facing, state.player.sleeping,
      state.player.inventory, state.step, state.key, cfg, atlas, size)


def render_px_fields(mat_map: jax.Array, ent_etype: jax.Array,
                     ent_aux: jax.Array, ent_facing: jax.Array,
                     ppos: jax.Array, pfacing: jax.Array,
                     sleeping: jax.Array, inventory: jax.Array,
                     step: jax.Array, key: jax.Array, cfg: EnvConfig,
                     atlas: Atlas) -> jax.Array:
  """One frame as raw (C,) int32 r|g<<8|b<<16 pixel lanes (jnp backend)."""
  packed = pack_cells(mat_map, ent_etype, ent_aux, ent_facing)
  win79 = _window_prep(packed, ppos, pfacing, sleeping, inventory, cfg)
  d = state_lib.daylight(step, cfg.day_length).reshape(1, 1)
  slp = jnp.asarray(sleeping).astype(jnp.int32).reshape(1, 1)
  seed = _noise_seed(key, step).reshape(1, 1)
  px = _render_core(win79[None], d.astype(jnp.float32), slp, seed,
                    atlas.mat_planes, atlas.spr_planes, atlas.expand,
                    atlas.vignette, atlas.view_mask)
  return px[0]


def render_fields(mat_map: jax.Array, ent_etype: jax.Array,
                  ent_aux: jax.Array, ent_facing: jax.Array,
                  ppos: jax.Array, pfacing: jax.Array, sleeping: jax.Array,
                  inventory: jax.Array, step: jax.Array, key: jax.Array,
                  cfg: EnvConfig, atlas: Atlas,
                  size: Tuple[int, int] = (64, 64)) -> jax.Array:
  """:func:`render` on bare field arrays (jnp backend, one frame)."""
  px = render_px_fields(mat_map, ent_etype, ent_aux, ent_facing, ppos,
                        pfacing, sleeping, inventory, step, key, cfg, atlas)
  return _frame_image(px, size)


def render_frames(packed: jax.Array, ppos: jax.Array, pfacing: jax.Array,
                  sleeping: jax.Array, inventory: jax.Array,
                  steps: jax.Array, seeds: jax.Array, cfg: EnvConfig,
                  atlas: Atlas, size: Tuple[int, int] = (64, 64),
                  block: int = 64, packed_out: bool = False,
                  out_format: Optional[str] = None) -> jax.Array:
  """A batch of frames as ONE Pallas kernel (bit-identical to
  vmap(:func:`render_fields`) — same ``_render_core`` trace).

  ``packed``: (B, C_cells) packed cell planes (:func:`pack_cells` or the
  group kernel's snapshots); ``seeds``: (B,) int32 from
  :func:`_noise_seed`.  ``out_format``:

  * ``'frames'`` (default) — (B, size[1], size[0], 3) uint8 via the
    external bitcast + 4->3 slice (:func:`_frame_image`).
  * ``'words'`` — the kernel compacts the NHWC byte stream into (B,
    3C/4) int32 words (:func:`_compact_words`, lane-roll ladder in
    VMEM), making the external unpack a pure bitcast
    (:func:`_image_from_words`).  Measured SLOWER end-to-end than
    'frames' (pixel 748k -> 599k: the 12-stage ladder costs ~13
    ms/group vs the ~5.8 ms slice copy it replaces — PERF.md dead-end
    ledger); kept for callers that need the byte stream itself.
  * ``'packed'`` — (B, C) int32 r|g<<8|b<<16 pixel lanes (the CNN's
    packed transport; ``packed_out=True`` is the legacy spelling).
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  if out_format is None:
    out_format = 'packed' if packed_out else 'frames'
  prep = jax.vmap(
      lambda pk, pp, pf, sl, inv: _window_prep(pk, pp, pf, sl, inv, cfg))
  win79 = prep(packed, ppos, pfacing, sleeping != 0, inventory)
  d = jax.vmap(lambda s: state_lib.daylight(s, cfg.day_length))(steps)
  return render_win79(win79, d, sleeping, seeds, atlas, size, block,
                      out_format)


def render_win79(win79: jax.Array, daylight: jax.Array,
                 sleeping: jax.Array, seeds: jax.Array, atlas: Atlas,
                 size: Tuple[int, int] = (64, 64), block: int = 64,
                 out_format: str = 'frames') -> jax.Array:
  """The Pallas frame-synthesis call on prepared (B, 79) window rows
  (see :func:`render_frames` for the output formats)."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  n = win79.shape[0]
  c = atlas.vignette.shape[-1]
  words = out_format == 'words'
  assert not words or c % 4 == 0, 'words output needs C % 4 == 0'
  out_w = 3 * c // 4 if words else c

  ins = [win79.astype(jnp.int32),
         daylight.astype(jnp.float32).reshape(-1, 1),
         sleeping.astype(jnp.int32).reshape(-1, 1),
         seeds.astype(jnp.int32).reshape(-1, 1)]
  pad = (-n) % block
  if pad:
    ins = [jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) for a in ins]
  np_ = n + pad

  if words:
    ladder, _ = _gather_ladder_masks(c)
    ladder = jnp.asarray(np.stack(ladder).astype(np.int32))
  else:
    ladder = jnp.zeros((1, c), jnp.int32)

  def kernel(win_ref, d_ref, sl_ref, sd_ref, mat_ref, spr_ref, exp_ref,
             vig_ref, msk_ref, lad_ref, out_ref):
    px = _render_core(
        win_ref[...], d_ref[...], sl_ref[...], sd_ref[...], mat_ref[...],
        spr_ref[...], exp_ref[...], vig_ref[...], msk_ref[...])
    out_ref[...] = _compact_words(px, lad_ref[...]) if words else px

  spec = lambda width: pl.BlockSpec((block, width), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
  tab = lambda rows: pl.BlockSpec((rows, c), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
  nm = atlas.mat_planes.shape[0]
  ns = atlas.spr_planes.shape[0]
  ne = atlas.expand.shape[0]
  px = pl.pallas_call(
      kernel,
      grid=(np_ // block,),
      in_specs=[spec(win79.shape[1])] + [spec(1)] * 3
               + [tab(nm), tab(ns), tab(ne), tab(1), tab(1),
                  tab(ladder.shape[0])],
      out_specs=spec(out_w),
      out_shape=jax.ShapeDtypeStruct((np_, out_w), jnp.int32),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=jax.default_backend() != 'tpu',  # CPU: test/debug mode
  )(*ins, atlas.mat_planes, atlas.spr_planes, atlas.expand,
    atlas.vignette, atlas.view_mask, ladder)
  px = px[:n]
  if out_format in ('packed', 'words'):
    return px
  return _frame_image(px, size)


def semantic_view(state: State, cfg: EnvConfig) -> jax.Array:
  """info['semantic'] (engine.py:251-264)."""
  return state_lib.semantic_view(state, cfg)
