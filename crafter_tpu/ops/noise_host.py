"""Host-side float64 OpenSimplex 3D noise for the seed-exact parity engine.

The reference's worldgen calls ``opensimplex.OpenSimplex(seed).noise3``
per cell (reference: crafter/worldgen.py:11, :79-91).  Parity mode needs the
same float64 values; this is the vectorized candidate-sum formulation of
Kurt Spencer's 2014 algorithm (sum over every lattice vertex with positive
attenuation — a superset of the original's contribution walk, identical
because excluded vertices have non-positive attenuation; validated against
a [-3,3]^3 brute-force sweep in tests/test_noise.py and gated against the
real PyPI package where installable).

The permutation table reproduces the package's 64-bit LCG seeding exactly
(ops/noise.py:perm_from_java_seed).
"""

from __future__ import annotations

import numpy as np

from .noise import perm_from_java_seed  # noqa: F401  (re-export for callers)

STRETCH = -1.0 / 6.0
SQUISH = 1.0 / 3.0
NORM = 103.0

GRAD3 = np.array([
    (-11, 4, 4), (-4, 11, 4), (-4, 4, 11),
    (11, 4, 4), (4, 11, 4), (4, 4, 11),
    (-11, -4, 4), (-4, -11, 4), (-4, -4, 11),
    (11, -4, 4), (4, -11, 4), (4, -4, 11),
    (-11, 4, -4), (-4, 11, -4), (-4, 4, -11),
    (11, 4, -4), (4, 11, -4), (4, 4, -11),
    (-11, -4, -4), (-4, -11, -4), (-4, -4, -11),
    (11, -4, -4), (4, -11, -4), (4, -4, -11),
], np.float64)

CANDIDATES = np.array([
    (-1, 0, 1), (-1, 1, 0), (-1, 1, 1),
    (0, -1, 1), (0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 1, -1), (0, 1, 0),
    (0, 1, 1), (0, 1, 2), (0, 2, 0), (0, 2, 1),
    (1, -1, 0), (1, -1, 1), (1, 0, -1), (1, 0, 0), (1, 0, 1), (1, 0, 2),
    (1, 1, -1), (1, 1, 0), (1, 1, 1), (1, 2, 0),
    (2, 0, 0), (2, 0, 1), (2, 1, 0),
], np.int64)  # 26 offsets covering every vertex with possible attn > 0


def noise3_host(points: np.ndarray, perm: np.ndarray) -> np.ndarray:
  """OpenSimplex noise3 at float64 ``points`` (..., 3); vectorized."""
  p = np.asarray(points, np.float64)
  s = p + STRETCH * p.sum(-1, keepdims=True)
  base = np.floor(s).astype(np.int64)
  verts = base[..., None, :] + CANDIDATES            # (..., 26, 3)
  vin = verts + SQUISH * verts.sum(-1, keepdims=True)
  d = p[..., None, :] - vin
  attn = np.maximum(0.0, 2.0 - (d * d).sum(-1))
  h = perm[verts[..., 0] & 0xFF]
  h = perm[(h + verts[..., 1]) & 0xFF]
  h = perm[(h + verts[..., 2]) & 0xFF] % 24
  grad = GRAD3[h]
  return (attn ** 4 * (grad * d).sum(-1)).sum(-1) / NORM
