"""Pallas TPU kernel for the worldgen gradient noise.

`ops/noise.py:noise3_fast` evaluates the 26 candidate lattice vertices with
a `lax.scan`, which bounds memory but round-trips every intermediate
through HBM 26 times.  This kernel unrolls the candidate loop inside one
Pallas program so the whole evaluation stays in VMEM — one kernel launch,
one HBM read of the points, one write of the result.

Bit-compatibility: same arithmetic in the same order as `noise3_fast`
(including the 2^-13 lattice nudge and the avalanche hash), so outputs
match the jnp path to float32 rounding (validated in
tests/test_noise.py::test_pallas_noise_matches_fast).

This is also the round-2 pilot for fusing the whole simulation tick into
Pallas mega-kernels (see PERF.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .noise import (CANDIDATES, CANDIDATES_2D, NORM_2D, NORM_3D, SQUISH_2D,
                    SQUISH_3D, STRETCH_2D, STRETCH_3D)

_LANES = 128
_SUBLANES = 256  # block = (256, 128) -> 32k points per program


def _noise_kernel(px_ref, py_ref, pz_ref, seed_ref, o_ref):
  px = px_ref[...]
  py = py_ref[...]
  pz = pz_ref[...]
  seed = seed_ref[...].astype(jnp.int32)

  stretch = (px + py + pz) * STRETCH_3D
  nudge = 2.0 ** -13
  xb = jnp.floor(px + stretch + nudge).astype(jnp.int32)
  yb = jnp.floor(py + stretch + nudge).astype(jnp.int32)
  zb = jnp.floor(pz + stretch + nudge).astype(jnp.int32)

  total = jnp.zeros_like(px)
  for cx, cy, cz in CANDIDATES.tolist():
    vx, vy, vz = xb + cx, yb + cy, zb + cz
    squish = (vx + vy + vz).astype(jnp.float32) * SQUISH_3D
    dx = px - (vx.astype(jnp.float32) + squish)
    dy = py - (vy.astype(jnp.float32) + squish)
    dz = pz - (vz.astype(jnp.float32) + squish)
    attn = jnp.maximum(2.0 - dx * dx - dy * dy - dz * dz, 0.0)
    attn2 = attn * attn
    h = (vx * jnp.int32(-1918454973) ^ vy * jnp.int32(-668077119)
         ^ vz * jnp.int32(-888626401) ^ seed)
    h = h * jnp.int32(0x27d4eb2f)
    h = h ^ (h >> 15)
    h = (h & 0x7FFFFFFF) % 24
    axis = h // 8
    bits = h % 8
    s0 = (1 - 2 * (bits & 1)).astype(jnp.float32)
    s1 = (1 - 2 * ((bits >> 1) & 1)).astype(jnp.float32)
    s2 = (1 - 2 * ((bits >> 2) & 1)).astype(jnp.float32)
    gx = jnp.where(axis == 0, 11.0, 4.0) * s0
    gy = jnp.where(axis == 1, 11.0, 4.0) * s1
    gz = jnp.where(axis == 2, 11.0, 4.0) * s2
    total = total + attn2 * attn2 * (gx * dx + gy * dy + gz * dz)
  o_ref[...] = total / NORM_3D


def _noise2_kernel(px_ref, py_ref, seed_ref, o_ref):
  px = px_ref[...]
  py = py_ref[...]
  seed = seed_ref[...].astype(jnp.int32)

  stretch = (px + py) * STRETCH_2D
  nudge = 2.0 ** -13
  xb = jnp.floor(px + stretch + nudge).astype(jnp.int32)
  yb = jnp.floor(py + stretch + nudge).astype(jnp.int32)

  total = jnp.zeros_like(px)
  for cx, cy in CANDIDATES_2D.tolist():
    vx, vy = xb + cx, yb + cy
    squish = (vx + vy).astype(jnp.float32) * SQUISH_2D
    dx = px - (vx.astype(jnp.float32) + squish)
    dy = py - (vy.astype(jnp.float32) + squish)
    attn = jnp.maximum(2.0 - dx * dx - dy * dy, 0.0)
    attn2 = attn * attn
    h = (vx * jnp.int32(-1918454973) ^ vy * jnp.int32(-668077119) ^ seed)
    h = h * jnp.int32(0x27d4eb2f)
    h = h ^ (h >> 15)
    s0 = (1 - 2 * (h & 1)).astype(jnp.float32)
    s1 = (1 - 2 * ((h >> 1) & 1)).astype(jnp.float32)
    long_x = (h >> 2) & 1
    gx = jnp.where(long_x == 1, 5.0, 2.0) * s0
    gy = jnp.where(long_x == 1, 2.0, 5.0) * s1
    total = total + attn2 * attn2 * (gx * dx + gy * dy)
  o_ref[...] = total / NORM_2D


def noise2_pallas(points: jax.Array, seed: jax.Array,
                  interpret: bool | None = None) -> jax.Array:
  """Drop-in for ops/noise.py:noise2_fast, fused into one Pallas kernel.

  `points` (..., 2) float32; `seed` int32, broadcastable against the
  leading point dims (per-channel seeds fold the reference's z axis in).
  """
  if interpret is None:
    interpret = jax.default_backend() != 'tpu'
  pts = points.astype(jnp.float32)
  shape = pts.shape[:-1]
  seeds = jnp.broadcast_to(jnp.asarray(seed, jnp.int32), shape).reshape(-1)
  flat = pts.reshape(-1, 2)
  p = flat.shape[0]

  block = _SUBLANES * _LANES
  rows = max(-(-p // block), 1) * _SUBLANES
  pad = rows * _LANES - p

  def to_grid(v):
    return jnp.pad(v, (0, pad)).reshape(rows, _LANES)

  px, py = (to_grid(flat[:, i]) for i in range(2))
  grid = rows // _SUBLANES
  out = pl.pallas_call(
      _noise2_kernel,
      grid=(grid,),
      in_specs=[pl.BlockSpec((_SUBLANES, _LANES), lambda i: (i, 0))] * 3,
      out_specs=pl.BlockSpec((_SUBLANES, _LANES), lambda i: (i, 0)),
      out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
      interpret=interpret,
  )(px, py, to_grid(seeds))
  return out.reshape(-1)[:p].reshape(shape)


def noise3_pallas(points: jax.Array, seed: jax.Array,
                  interpret: bool | None = None) -> jax.Array:
  """Drop-in for ops/noise.py:noise3_fast, fused into one Pallas kernel.

  `points` (..., 3) float32; `seed` scalar int32.  Points are padded to a
  (rows, 128) layout; each grid program processes a (256, 128) block.
  Interpret mode is selected automatically on non-TPU backends (Mosaic
  only lowers for TPU).
  """
  if interpret is None:
    interpret = jax.default_backend() != 'tpu'
  pts = points.astype(jnp.float32)
  shape = pts.shape[:-1]
  flat = pts.reshape(-1, 3)
  p = flat.shape[0]

  block = _SUBLANES * _LANES
  rows = max(-(-p // block), 1) * _SUBLANES
  pad = rows * _LANES - p

  def to_grid(v):
    return jnp.pad(v, (0, pad)).reshape(rows, _LANES)

  px, py, pz = (to_grid(flat[:, i]) for i in range(3))
  seed_grid = jnp.broadcast_to(jnp.asarray(seed, jnp.int32),
                               (rows, _LANES))
  grid = rows // _SUBLANES
  out = pl.pallas_call(
      _noise_kernel,
      grid=(grid,),
      in_specs=[pl.BlockSpec((_SUBLANES, _LANES), lambda i: (i, 0))] * 4,
      out_specs=pl.BlockSpec((_SUBLANES, _LANES), lambda i: (i, 0)),
      out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
      interpret=interpret,
  )(px, py, pz, seed_grid)
  return out.reshape(-1)[:p].reshape(shape)
