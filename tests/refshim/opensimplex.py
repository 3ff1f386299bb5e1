"""Minimal OpenSimplex shim for the reference's worldgen.

Float64 numpy implementation of Kurt Spencer's 2014 OpenSimplex 3D noise —
the same formulation as crafter_tpu/ops/noise.py (sum over candidate
lattice vertices of ``max(0, 2-|d|^2)^4 * grad.d`` / 103), with the
original's 64-bit LCG seeded permutation table, so
``opensimplex.OpenSimplex(seed).noise3(x, y, z)`` behaves like the PyPI
package the reference imports (crafter/worldgen.py:4, :11, :84-87).
"""

import numpy as np

_STRETCH = -1.0 / 6.0
_SQUISH = 1.0 / 3.0
_NORM = 103.0

_GRAD3 = np.array([
    (-11, 4, 4), (-4, 11, 4), (-4, 4, 11),
    (11, 4, 4), (4, 11, 4), (4, 4, 11),
    (-11, -4, 4), (-4, -11, 4), (-4, -4, 11),
    (11, -4, 4), (4, -11, 4), (4, -4, 11),
    (-11, 4, -4), (-4, 11, -4), (-4, 4, -11),
    (11, 4, -4), (4, 11, -4), (4, 4, -11),
    (-11, -4, -4), (-4, -11, -4), (-4, -4, -11),
    (11, -4, -4), (4, -11, -4), (4, -4, -11),
], np.float64)

_CANDIDATES = [
    (-1, 0, 1), (-1, 1, 0), (-1, 1, 1),
    (0, -1, 1), (0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 1, -1), (0, 1, 0),
    (0, 1, 1), (0, 1, 2), (0, 2, 0), (0, 2, 1),
    (1, -1, 0), (1, -1, 1), (1, 0, -1), (1, 0, 0), (1, 0, 1), (1, 0, 2),
    (1, 1, -1), (1, 1, 0), (1, 1, 1), (1, 2, 0),
    (2, 0, 0), (2, 0, 1), (2, 1, 0),
]


class OpenSimplex:

  def __init__(self, seed=0):
    mask = (1 << 64) - 1
    mul, add = 6364136223846793005, 1442695040888963407
    s = seed & mask
    for _ in range(3):
      s = (s * mul + add) & mask
    source = list(range(256))
    perm = np.zeros(256, np.int64)
    for i in range(255, -1, -1):
      s = (s * mul + add) & mask
      t = (s + 31) & mask
      t = t - (1 << 64) if t >= (1 << 63) else t
      r = t % (i + 1)
      perm[i] = source[r]
      source[r] = source[i]
    self._perm = perm

  def noise3(self, x, y, z):
    p = np.array([x, y, z], np.float64)
    stretched = p + p.sum() * _STRETCH
    base = np.floor(stretched).astype(np.int64)
    total = 0.0
    perm = self._perm
    for c in _CANDIDATES:
      v = base + c
      d = p - (v + v.sum() * _SQUISH)
      attn = 2.0 - (d * d).sum()
      if attn <= 0:
        continue
      h = perm[(perm[(perm[v[0] & 0xFF] + v[1]) & 0xFF] + v[2]) & 0xFF] % 24
      total += attn ** 4 * (_GRAD3[h] * d).sum()
    return total / _NORM

  noise3d = noise3  # older opensimplex API name (worldgen.py:84-85)
