"""OpenSimplex 3D gradient noise as a batched JAX kernel.

The reference generates terrain by calling ``opensimplex.OpenSimplex.noise3``
once per cell per channel inside a Python double loop
(reference: crafter/worldgen.py:10-18, :79-91).  Here the same noise field is
evaluated as one vectorized kernel over all cells and channels at once.

Formulation: OpenSimplex noise (Kurt Spencer's 2014 algorithm, as shipped by
the ``opensimplex`` PyPI package) sums, over lattice vertices ``v`` of the
stretched simplectic honeycomb, ``max(0, 2 - |d|²)⁴ · (grad(v) · d)`` and
divides by 103.  The original uses per-region branchy vertex lists purely as
an optimization; those lists are exactly the vertices with positive
attenuation.  We instead evaluate a *static* 26-candidate superset around the
base lattice cell (verified exhaustively in tests/test_noise.py) and let the
``max(0, ·)`` mask do the region logic — branch-free, so XLA maps it onto the
VPU across (env, cell, channel, candidate) in one fused elementwise pass.

Constants (STRETCH = -1/6, SQUISH = 1/3, NORM = 103) and the gradient /
permutation-hash scheme follow the original algorithm so that the produced
terrain is distributed identically to the reference's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

STRETCH_3D = -1.0 / 6.0
SQUISH_3D = 1.0 / 3.0
NORM_3D = 103.0

# The 24 gradient directions of OpenSimplex 3D (original `gradients3D`,
# rhombicuboctahedron vertices), as a (24, 3) table.
GRAD3 = np.array([
    (-11, 4, 4), (-4, 11, 4), (-4, 4, 11),
    (11, 4, 4), (4, 11, 4), (4, 4, 11),
    (-11, -4, 4), (-4, -11, 4), (-4, -4, 11),
    (11, -4, 4), (4, -11, 4), (4, -4, 11),
    (-11, 4, -4), (-4, 11, -4), (-4, 4, -11),
    (11, 4, -4), (4, 11, -4), (4, 4, -11),
    (-11, -4, -4), (-4, -11, -4), (-4, -4, -11),
    (11, -4, -4), (4, -11, -4), (4, -4, -11),
], np.float32)

# All lattice offsets relative to floor(stretched point) that can ever have
# positive attenuation (2 - |d|² > 0).  Determined by exhaustive sweep; see
# tests/test_noise.py::test_candidate_offsets_complete.
CANDIDATES = np.array([
    (-1, 0, 1), (-1, 1, 0), (-1, 1, 1),
    (0, -1, 1), (0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 1, -1), (0, 1, 0),
    (0, 1, 1), (0, 1, 2), (0, 2, 0), (0, 2, 1),
    (1, -1, 0), (1, -1, 1), (1, 0, -1), (1, 0, 0), (1, 0, 1), (1, 0, 2),
    (1, 1, -1), (1, 1, 0), (1, 1, 1), (1, 2, 0),
    (2, 0, 0), (2, 0, 1), (2, 1, 0),
], np.int32)  # (26, 3)


def perm_from_key(key: jax.Array) -> jax.Array:
  """Random permutation table (256,) int32 from a JAX PRNG key.

  Distribution-identical to the original's seeded Fisher–Yates shuffle
  (a uniformly random permutation of 0..255); use `perm_from_java_seed` when
  bit-parity with a specific ``opensimplex`` seed is required.
  """
  return jax.random.permutation(key, 256).astype(jnp.int32)


def perm_from_java_seed(seed: int) -> np.ndarray:
  """Exact permutation table of ``opensimplex.OpenSimplex(seed)`` (numpy).

  Reproduces the original 64-bit LCG Fisher–Yates: three warm-up LCG steps,
  then for i = 255..0 draw ``r = (seed + 31) % (i + 1)`` (signed, corrected
  to non-negative) and swap.  Host-side helper for parity mode.
  """
  mask = (1 << 64) - 1
  mul, add = 6364136223846793005, 1442695040888963407
  s = seed & mask
  for _ in range(3):
    s = (s * mul + add) & mask
  source = list(range(256))
  perm = np.zeros(256, np.int32)
  for i in range(255, -1, -1):
    s = (s * mul + add) & mask
    t = (s + 31) & mask
    t_signed = t - (1 << 64) if t >= (1 << 63) else t
    r = t_signed % (i + 1)  # Python % is mathematical mod, matching the
    #                         original's sign correction (`if r < 0: r += i+1`).
    perm[i] = source[r]
    source[r] = source[i]
  return perm


@functools.partial(jax.jit, static_argnames=())
def noise3(points: jax.Array, perm: jax.Array) -> jax.Array:
  """OpenSimplex 3D noise at `points` (..., 3) given a perm table (256,).

  Returns values in roughly [-0.87, 0.87] with the original's normalization.
  Float32 on device (the reference runs float64 on CPU; the coarse worldgen
  thresholds make the difference immaterial, see tests).

  The 26 candidate vertices are accumulated in an unrolled loop so every
  intermediate is (P,)-shaped — one fused elementwise pass on the VPU.
  (A (P, 26, 3) formulation materializes tens of GB at a 4096-env reset.)
  """
  pts = points.astype(jnp.float32)
  shape = pts.shape[:-1]
  pts = pts.reshape(-1, 3)  # (P, 3)

  stretch = pts.sum(-1, keepdims=True) * STRETCH_3D
  # Worldgen evaluates on rational grid points (x/3, y/15, ...) whose
  # stretched coordinates frequently land *exactly* on lattice boundaries;
  # there a 1-ulp difference between two XLA compilations (fusion/FMA
  # choices, e.g. batched vs unbatched) flips `floor` and with it the
  # gradient hash.  The nudge moves the boundary off that degenerate set so
  # every compilation agrees; it shifts the sampled field by <1e-4 cells,
  # far below the worldgen thresholds' sensitivity.
  base = jnp.floor(pts + stretch + 2 ** -13).astype(jnp.int32)  # (P, 3)
  px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
  xb, yb, zb = base[:, 0], base[:, 1], base[:, 2]

  perm = perm.astype(jnp.int32)
  gx = jnp.asarray(GRAD3[:, 0])
  gy = jnp.asarray(GRAD3[:, 1])
  gz = jnp.asarray(GRAD3[:, 2])

  def body(total, cand):
    cx, cy, cz = cand[0], cand[1], cand[2]
    vx, vy, vz = xb + cx, yb + cy, zb + cz
    squish = (vx + vy + vz).astype(jnp.float32) * SQUISH_3D
    dx = px - (vx.astype(jnp.float32) + squish)
    dy = py - (vy.astype(jnp.float32) + squish)
    dz = pz - (vz.astype(jnp.float32) + squish)
    attn = jnp.maximum(2.0 - dx * dx - dy * dy - dz * dz, 0.0)
    attn2 = attn * attn
    # Gradient hash: perm[(perm[(perm[x&255]+y)&255]+z)&255] % 24 (the
    # original's permGradIndex3D stores the same value *3 for flat access).
    h = perm[(perm[(perm[vx & 0xFF] + vy) & 0xFF] + vz) & 0xFF] % 24
    return total + attn2 * attn2 * (gx[h] * dx + gy[h] * dy + gz[h] * dz), None

  # lax.scan (not an unrolled Python loop): the hash gathers block
  # elementwise fusion, so unrolling materializes ~6 P-sized buffers per
  # candidate — 68 GB at a 4096-env reset.  The scan reuses one iteration's
  # buffers 26 times, bounding peak memory at a handful of (P,) arrays.
  total, _ = jax.lax.scan(body, jnp.zeros(pts.shape[:1], jnp.float32),
                          jnp.asarray(CANDIDATES))
  return (total / NORM_3D).reshape(shape)


@functools.partial(jax.jit, static_argnames=())
def noise3_fast(points: jax.Array, seed: jax.Array) -> jax.Array:
  """OpenSimplex-structured noise with an arithmetic gradient hash.

  Same lattice, attenuation, gradients, and normalization as :func:`noise3`
  but the per-vertex gradient is picked by integer mixing instead of the
  three chained 256-entry permutation-table gathers.  On TPU the table
  gathers dominate the whole worldgen (26 candidates × 3 dependent gathers
  per point ≈ billions of serial gathered elements per batched reset);
  this variant is pure VPU arithmetic.

  The original hash is `perm[(perm[(perm[x&255]+y)&255]+z)&255] % 24` — an
  (almost) uniform pick of one of 24 gradients per lattice vertex with a
  256-periodic tile.  The arithmetic mix picks uniformly from the same 24
  gradients without the 256-tile, so the produced field is
  distribution-equivalent (validated against the live reference engine in
  tests/test_reference_parity.py).  `seed` is any int32 array/scalar.
  """
  pts = points.astype(jnp.float32)
  shape = pts.shape[:-1]
  pts = pts.reshape(-1, 3)

  stretch = pts.sum(-1, keepdims=True) * STRETCH_3D
  base = jnp.floor(pts + stretch + 2 ** -13).astype(jnp.int32)
  px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
  xb, yb, zb = base[:, 0], base[:, 1], base[:, 2]
  seed = jnp.asarray(seed, jnp.int32)

  total = jnp.zeros(pts.shape[:1], jnp.float32)
  for cx, cy, cz in CANDIDATES.tolist():
    vx, vy, vz = xb + cx, yb + cy, zb + cz
    squish = (vx + vy + vz).astype(jnp.float32) * SQUISH_3D
    dx = px - (vx.astype(jnp.float32) + squish)
    dy = py - (vy.astype(jnp.float32) + squish)
    dz = pz - (vz.astype(jnp.float32) + squish)
    attn = jnp.maximum(2.0 - dx * dx - dy * dy - dz * dz, 0.0)
    attn2 = attn * attn
    # xxhash-style avalanche over (vertex, seed) -> gradient id in [0, 24).
    h = (vx * jnp.int32(-1918454973) ^ vy * jnp.int32(-668077119)
         ^ vz * jnp.int32(-888626401) ^ seed)
    h = h * jnp.int32(0x27d4eb2f)
    h = h ^ (h >> 15)
    h = (h & 0x7FFFFFFF) % 24
    # The 24 gradients are (+-11, +-4, +-4) with the 11 on `axis`
    # (GRAD3's structure): decode arithmetically instead of gathering.
    axis = h // 8
    bits = h % 8
    s0 = 1 - 2 * (bits & 1)
    s1 = 1 - 2 * ((bits >> 1) & 1)
    s2 = 1 - 2 * ((bits >> 2) & 1)
    gx = jnp.where(axis == 0, 11, 4) * s0
    gy = jnp.where(axis == 1, 11, 4) * s1
    gz = jnp.where(axis == 2, 11, 4) * s2
    total += attn2 * attn2 * (gx * dx + gy * dy + gz * dz)
  return (total / NORM_3D).reshape(shape)


STRETCH_2D = float((1.0 / np.sqrt(3.0) - 1.0) / 2.0)
SQUISH_2D = float((np.sqrt(3.0) - 1.0) / 2.0)
# The original 2-D normalizer is 47; 55 rescales the field so its standard
# deviation matches the 3-D field's on 64x64 worldgen grids (ratio 0.854
# +-0.008 across all 13 channel scales, measured over 40 worlds/channel) —
# the material thresholds were tuned by the reference against 3-D noise.
NORM_2D = 55.0

# All 2-D lattice offsets that can ever have positive attenuation, by the
# same exhaustive sweep as CANDIDATES (tests/test_noise.py).
CANDIDATES_2D = np.array([
    (-1, 1), (0, 0), (0, 1), (0, 2), (1, -1), (1, 0), (1, 1), (2, 0),
], np.int32)  # (8, 2)


@functools.partial(jax.jit, static_argnames=())
def noise2_fast(points: jax.Array, seed: jax.Array) -> jax.Array:
  """2-D OpenSimplex-structured noise with an arithmetic gradient hash.

  Every worldgen channel evaluates the reference's 3-D noise at a *constant
  integer z* (crafter/worldgen.py:79-91 — z only selects the feature), so
  the fast path can fold z into the seed and run the 2-D lattice instead:
  8 candidate vertices instead of 26 and one fewer coordinate everywhere,
  ~4x fewer operations per point for a field with the same spectral
  character at the same feature scales.  Like `noise3_fast` this is the
  distribution-level path (validated against the live reference engine in
  tests/test_reference_parity.py); seed-exact parity mode keeps the real
  permutation-table OpenSimplex (crafter_tpu/parity.py).

  `points` is (..., 2) float32; `seed` is int32, broadcastable against the
  leading point dims (pass per-channel seeds to fold the z axis in).
  """
  pts = points.astype(jnp.float32)
  shape = pts.shape[:-1]
  seed = jnp.broadcast_to(jnp.asarray(seed, jnp.int32), shape).reshape(-1)
  pts = pts.reshape(-1, 2)

  stretch = pts.sum(-1, keepdims=True) * STRETCH_2D
  base = jnp.floor(pts + stretch + 2 ** -13).astype(jnp.int32)
  px, py = pts[:, 0], pts[:, 1]
  xb, yb = base[:, 0], base[:, 1]

  total = jnp.zeros(pts.shape[:1], jnp.float32)
  for cx, cy in CANDIDATES_2D.tolist():
    vx, vy = xb + cx, yb + cy
    squish = (vx + vy).astype(jnp.float32) * SQUISH_2D
    dx = px - (vx.astype(jnp.float32) + squish)
    dy = py - (vy.astype(jnp.float32) + squish)
    attn = jnp.maximum(2.0 - dx * dx - dy * dy, 0.0)
    attn2 = attn * attn
    # xxhash-style avalanche over (vertex, seed) -> gradient id in [0, 8).
    h = (vx * jnp.int32(-1918454973) ^ vy * jnp.int32(-668077119) ^ seed)
    h = h * jnp.int32(0x27d4eb2f)
    h = h ^ (h >> 15)
    # The 8 gradients are (+-5, +-2) / (+-2, +-5) (the original
    # `gradients2D`): bit 0 picks the long axis, bits 1-2 the signs.
    s0 = 1 - 2 * (h & 1)
    s1 = 1 - 2 * ((h >> 1) & 1)
    long_x = (h >> 2) & 1
    gx = jnp.where(long_x == 1, 5, 2) * s0
    gy = jnp.where(long_x == 1, 2, 5) * s1
    total += attn2 * attn2 * (gx * dx + gy * dy)
  return (total / NORM_2D).reshape(shape)


def octaved_noise3(xy: jax.Array, z: float, sizes: dict[float, float],
                   perm: jax.Array, normalize: bool = True) -> jax.Array:
  """The reference's `_simplex` octave helper (worldgen.py:79-91).

  `xy` is (..., 2); each (size, weight) adds `weight * noise3(xy/size, z)`;
  `normalize` divides by the weight sum.
  """
  total = None
  for size, weight in sizes.items():
    pts = jnp.concatenate([
        xy.astype(jnp.float32) / size,
        jnp.full(xy.shape[:-1] + (1,), z, jnp.float32)], -1)
    val = weight * noise3(pts, perm)
    total = val if total is None else total + val
  if normalize:
    total = total / sum(sizes.values())
  return total
