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
  """
  pts = points.astype(jnp.float32)
  shape = pts.shape[:-1]
  pts = pts.reshape(-1, 3)  # (P, 3)

  stretch = pts.sum(-1, keepdims=True) * STRETCH_3D
  stretched = pts + stretch                      # (P, 3)
  base = jnp.floor(stretched).astype(jnp.int32)  # (P, 3)

  verts = base[:, None, :] + CANDIDATES[None, :, :]          # (P, 26, 3)
  squish = verts.sum(-1, keepdims=True).astype(jnp.float32) * SQUISH_3D
  d = pts[:, None, :] - (verts.astype(jnp.float32) + squish)  # (P, 26, 3)

  attn = 2.0 - jnp.sum(d * d, axis=-1)                        # (P, 26)
  attn = jnp.maximum(attn, 0.0)
  attn2 = attn * attn
  attn4 = attn2 * attn2

  # Gradient hash: permGradIndex3D[(perm[(perm[x&255]+y)&255]+z)&255] with
  # permGradIndex3D[i] = (perm[i] % 24) (original stores *3 for flat access).
  perm = perm.astype(jnp.int32)
  vx, vy, vz = verts[..., 0], verts[..., 1], verts[..., 2]
  h = perm[vx & 0xFF]
  h = perm[(h + vy) & 0xFF]
  h = perm[(h + vz) & 0xFF] % 24
  grad = jnp.asarray(GRAD3)[h]                                # (P, 26, 3)

  contrib = attn4 * jnp.sum(grad * d, axis=-1)                # (P, 26)
  return (contrib.sum(-1) / NORM_3D).reshape(shape)


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
