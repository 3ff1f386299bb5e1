"""Independent OpenSimplex 3D oracle: the original branch-cascade walk.

The repo carries TWO other formulations of OpenSimplex noise3 — the
vectorized candidate-sum used by the parity engine
(crafter_tpu/ops/noise_host.py) and the test shim the live reference
imports (tests/refshim/opensimplex.py).  Both share one formulation, so a
shared bug would cancel out in the bit-exact oracle (VERDICT r4,
missing #3).  This module is the third, structurally disjoint
implementation: Kurt Spencer's original 2014 public-domain OpenSimplex
noise — the exact algorithm the PyPI ``opensimplex`` package the
reference depends on transcribes (reference: crafter/worldgen.py:4,
:84-87) — written as the region decision tree (tetrahedron /
octahedron / tetrahedron with two cascade-selected extra vertices), with
the walk's own contribution ACCUMULATION ORDER.  Scalar Python floats
are IEEE doubles with left-associative evaluation, so identical op order
gives bit-identical results to a C/Java/numpy-scalar transcription.

It is deliberately branchy and slow; its only job is generating/checking
golden values (tests/golden/opensimplex_golden.json,
tests/test_noise.py).
"""

STRETCH = -1.0 / 6.0
SQUISH = 1.0 / 3.0
NORM = 103.0

GRADIENTS3 = (
    -11, 4, 4, -4, 11, 4, -4, 4, 11,
    11, 4, 4, 4, 11, 4, 4, 4, 11,
    -11, -4, 4, -4, -11, 4, -4, -4, 11,
    11, -4, 4, 4, -11, 4, 4, -4, 11,
    -11, 4, -4, -4, 11, -4, -4, 4, -11,
    11, 4, -4, 4, 11, -4, 4, 4, -11,
    -11, -4, -4, -4, -11, -4, -4, -4, -11,
    11, -4, -4, 4, -11, -4, 4, -4, -11,
)

_MASK64 = (1 << 64) - 1
_MUL = 6364136223846793005
_ADD = 1442695040888963407


def _floor(x):
  xi = int(x)
  return xi - 1 if x < xi else xi


class OpenSimplexWalk:
  """`OpenSimplex(seed).noise3(x, y, z)` via the original decision tree."""

  def __init__(self, seed=0):
    s = seed & _MASK64
    for _ in range(3):
      s = (s * _MUL + _ADD) & _MASK64
    source = list(range(256))
    perm = [0] * 256
    grad_index = [0] * 256
    for i in range(255, -1, -1):
      s = (s * _MUL + _ADD) & _MASK64
      t = (s + 31) & _MASK64
      if t >= 1 << 63:       # Java long is signed; % then fixes r < 0,
        t -= 1 << 64         # which Python's floor-mod does natively.
      r = t % (i + 1)
      perm[i] = source[r]
      grad_index[i] = perm[i] % 24 * 3
      source[r] = source[i]
    self._perm = perm
    self._grad_index = grad_index

  def _extrapolate(self, xsb, ysb, zsb, dx, dy, dz):
    perm = self._perm
    index = self._grad_index[
        (perm[(perm[xsb & 0xFF] + ysb) & 0xFF] + zsb) & 0xFF]
    g = GRADIENTS3
    return g[index] * dx + g[index + 1] * dy + g[index + 2] * dz

  def noise3(self, x, y, z):
    stretch_offset = (x + y + z) * STRETCH
    xs = x + stretch_offset
    ys = y + stretch_offset
    zs = z + stretch_offset
    xsb = _floor(xs)
    ysb = _floor(ys)
    zsb = _floor(zs)
    squish_offset = (xsb + ysb + zsb) * SQUISH
    xb = xsb + squish_offset
    yb = ysb + squish_offset
    zb = zsb + squish_offset
    xins = xs - xsb
    yins = ys - ysb
    zins = zs - zsb
    in_sum = xins + yins + zins
    dx0 = x - xb
    dy0 = y - yb
    dz0 = z - zb
    value = 0.0
    ext = self._extrapolate

    if in_sum <= 1:  # inside the tetrahedron at (0,0,0)
      a_point, a_score = 0x01, xins
      b_point, b_score = 0x02, yins
      if a_score >= b_score and zins > b_score:
        b_score, b_point = zins, 0x04
      elif a_score < b_score and zins > a_score:
        a_score, a_point = zins, 0x04
      wins = 1 - in_sum
      if wins > a_score or wins > b_score:
        # (0,0,0) is one of the closest two tetrahedral vertices.
        c = b_point if b_score > a_score else a_point
        if (c & 0x01) == 0:
          xsv_ext0, xsv_ext1 = xsb - 1, xsb
          dx_ext0, dx_ext1 = dx0 + 1, dx0
        else:
          xsv_ext0 = xsv_ext1 = xsb + 1
          dx_ext0 = dx_ext1 = dx0 - 1
        if (c & 0x02) == 0:
          ysv_ext0 = ysv_ext1 = ysb
          dy_ext0 = dy_ext1 = dy0
          if (c & 0x01) == 0:
            ysv_ext1 -= 1
            dy_ext1 += 1
          else:
            ysv_ext0 -= 1
            dy_ext0 += 1
        else:
          ysv_ext0 = ysv_ext1 = ysb + 1
          dy_ext0 = dy_ext1 = dy0 - 1
        if (c & 0x04) == 0:
          zsv_ext0, zsv_ext1 = zsb, zsb - 1
          dz_ext0, dz_ext1 = dz0, dz0 + 1
        else:
          zsv_ext0 = zsv_ext1 = zsb + 1
          dz_ext0 = dz_ext1 = dz0 - 1
      else:
        # (0,0,0) is not one of the closest two; exts come from the pair.
        c = a_point | b_point
        if (c & 0x01) == 0:
          xsv_ext0, xsv_ext1 = xsb, xsb - 1
          dx_ext0 = dx0 - 2 * SQUISH
          dx_ext1 = dx0 + 1 - SQUISH
        else:
          xsv_ext0 = xsv_ext1 = xsb + 1
          dx_ext0 = dx0 - 1 - 2 * SQUISH
          dx_ext1 = dx0 - 1 - SQUISH
        if (c & 0x02) == 0:
          ysv_ext0, ysv_ext1 = ysb, ysb - 1
          dy_ext0 = dy0 - 2 * SQUISH
          dy_ext1 = dy0 + 1 - SQUISH
        else:
          ysv_ext0 = ysv_ext1 = ysb + 1
          dy_ext0 = dy0 - 1 - 2 * SQUISH
          dy_ext1 = dy0 - 1 - SQUISH
        if (c & 0x04) == 0:
          zsv_ext0, zsv_ext1 = zsb, zsb - 1
          dz_ext0 = dz0 - 2 * SQUISH
          dz_ext1 = dz0 + 1 - SQUISH
        else:
          zsv_ext0 = zsv_ext1 = zsb + 1
          dz_ext0 = dz0 - 1 - 2 * SQUISH
          dz_ext1 = dz0 - 1 - SQUISH

      attn0 = 2 - dx0 * dx0 - dy0 * dy0 - dz0 * dz0
      if attn0 > 0:
        attn0 *= attn0
        value = attn0 * attn0 * ext(xsb, ysb, zsb, dx0, dy0, dz0)
      dx1 = dx0 - 1 - SQUISH
      dy1 = dy0 - 0 - SQUISH
      dz1 = dz0 - 0 - SQUISH
      attn1 = 2 - dx1 * dx1 - dy1 * dy1 - dz1 * dz1
      if attn1 > 0:
        attn1 *= attn1
        value += attn1 * attn1 * ext(xsb + 1, ysb, zsb, dx1, dy1, dz1)
      dx2 = dx0 - 0 - SQUISH
      dy2 = dy0 - 1 - SQUISH
      dz2 = dz1
      attn2 = 2 - dx2 * dx2 - dy2 * dy2 - dz2 * dz2
      if attn2 > 0:
        attn2 *= attn2
        value += attn2 * attn2 * ext(xsb, ysb + 1, zsb, dx2, dy2, dz2)
      dx3 = dx2
      dy3 = dy1
      dz3 = dz0 - 1 - SQUISH
      attn3 = 2 - dx3 * dx3 - dy3 * dy3 - dz3 * dz3
      if attn3 > 0:
        attn3 *= attn3
        value += attn3 * attn3 * ext(xsb, ysb, zsb + 1, dx3, dy3, dz3)

    elif in_sum >= 2:  # inside the tetrahedron at (1,1,1)
      a_point, a_score = 0x06, xins
      b_point, b_score = 0x05, yins
      if a_score <= b_score and zins < b_score:
        b_score, b_point = zins, 0x03
      elif a_score > b_score and zins < a_score:
        a_score, a_point = zins, 0x03
      wins = 3 - in_sum
      if wins < a_score or wins < b_score:
        # (1,1,1) is one of the closest two tetrahedral vertices.
        c = b_point if b_score < a_score else a_point
        if (c & 0x01) != 0:
          xsv_ext0, xsv_ext1 = xsb + 2, xsb + 1
          dx_ext0 = dx0 - 2 - 3 * SQUISH
          dx_ext1 = dx0 - 1 - 3 * SQUISH
        else:
          xsv_ext0 = xsv_ext1 = xsb
          dx_ext0 = dx_ext1 = dx0 - 3 * SQUISH
        if (c & 0x02) != 0:
          ysv_ext0 = ysv_ext1 = ysb + 1
          dy_ext0 = dy_ext1 = dy0 - 1 - 3 * SQUISH
          if (c & 0x01) != 0:
            ysv_ext1 += 1
            dy_ext1 -= 1
          else:
            ysv_ext0 += 1
            dy_ext0 -= 1
        else:
          ysv_ext0 = ysv_ext1 = ysb
          dy_ext0 = dy_ext1 = dy0 - 3 * SQUISH
        if (c & 0x04) != 0:
          zsv_ext0, zsv_ext1 = zsb + 1, zsb + 2
          dz_ext0 = dz0 - 1 - 3 * SQUISH
          dz_ext1 = dz0 - 2 - 3 * SQUISH
        else:
          zsv_ext0 = zsv_ext1 = zsb
          dz_ext0 = dz_ext1 = dz0 - 3 * SQUISH
      else:
        # (1,1,1) is not one of the closest two; exts come from the pair.
        c = a_point & b_point
        if (c & 0x01) != 0:
          xsv_ext0, xsv_ext1 = xsb + 1, xsb + 2
          dx_ext0 = dx0 - 1 - SQUISH
          dx_ext1 = dx0 - 2 - 2 * SQUISH
        else:
          xsv_ext0 = xsv_ext1 = xsb
          dx_ext0 = dx0 - SQUISH
          dx_ext1 = dx0 - 2 * SQUISH
        if (c & 0x02) != 0:
          ysv_ext0, ysv_ext1 = ysb + 1, ysb + 2
          dy_ext0 = dy0 - 1 - SQUISH
          dy_ext1 = dy0 - 2 - 2 * SQUISH
        else:
          ysv_ext0 = ysv_ext1 = ysb
          dy_ext0 = dy0 - SQUISH
          dy_ext1 = dy0 - 2 * SQUISH
        if (c & 0x04) != 0:
          zsv_ext0, zsv_ext1 = zsb + 1, zsb + 2
          dz_ext0 = dz0 - 1 - SQUISH
          dz_ext1 = dz0 - 2 - 2 * SQUISH
        else:
          zsv_ext0 = zsv_ext1 = zsb
          dz_ext0 = dz0 - SQUISH
          dz_ext1 = dz0 - 2 * SQUISH

      dx3 = dx0 - 1 - 2 * SQUISH
      dy3 = dy0 - 1 - 2 * SQUISH
      dz3 = dz0 - 0 - 2 * SQUISH
      attn3 = 2 - dx3 * dx3 - dy3 * dy3 - dz3 * dz3
      if attn3 > 0:
        attn3 *= attn3
        value = attn3 * attn3 * ext(xsb + 1, ysb + 1, zsb, dx3, dy3, dz3)
      dx2 = dx3
      dy2 = dy0 - 0 - 2 * SQUISH
      dz2 = dz0 - 1 - 2 * SQUISH
      attn2 = 2 - dx2 * dx2 - dy2 * dy2 - dz2 * dz2
      if attn2 > 0:
        attn2 *= attn2
        value += attn2 * attn2 * ext(xsb + 1, ysb, zsb + 1, dx2, dy2, dz2)
      dx1 = dx0 - 0 - 2 * SQUISH
      dy1 = dy3
      dz1 = dz2
      attn1 = 2 - dx1 * dx1 - dy1 * dy1 - dz1 * dz1
      if attn1 > 0:
        attn1 *= attn1
        value += attn1 * attn1 * ext(xsb, ysb + 1, zsb + 1, dx1, dy1, dz1)
      dx0 = dx0 - 1 - 3 * SQUISH
      dy0 = dy0 - 1 - 3 * SQUISH
      dz0 = dz0 - 1 - 3 * SQUISH
      attn0 = 2 - dx0 * dx0 - dy0 * dy0 - dz0 * dz0
      if attn0 > 0:
        attn0 *= attn0
        value += attn0 * attn0 * ext(xsb + 1, ysb + 1, zsb + 1,
                                     dx0, dy0, dz0)

    else:  # inside the octahedron (rectified 3-simplex) in between
      p1 = xins + yins
      if p1 > 1:
        a_score, a_point, a_is_further_side = p1 - 1, 0x03, True
      else:
        a_score, a_point, a_is_further_side = 1 - p1, 0x04, False
      p2 = xins + zins
      if p2 > 1:
        b_score, b_point, b_is_further_side = p2 - 1, 0x05, True
      else:
        b_score, b_point, b_is_further_side = 1 - p2, 0x02, False
      # The closest of (1,0,0)/(0,1,1) replaces the furthest of a/b if
      # closer.
      p3 = yins + zins
      if p3 > 1:
        score = p3 - 1
        if a_score <= b_score and a_score < score:
          a_score, a_point, a_is_further_side = score, 0x06, True
        elif a_score > b_score and b_score < score:
          b_score, b_point, b_is_further_side = score, 0x06, True
      else:
        score = 1 - p3
        if a_score <= b_score and a_score < score:
          a_score, a_point, a_is_further_side = score, 0x01, False
        elif a_score > b_score and b_score < score:
          b_score, b_point, b_is_further_side = score, 0x01, False

      if a_is_further_side == b_is_further_side:
        if a_is_further_side:
          # Both closest points on the (1,1,1) side: one ext is (1,1,1).
          dx_ext0 = dx0 - 1 - 3 * SQUISH
          dy_ext0 = dy0 - 1 - 3 * SQUISH
          dz_ext0 = dz0 - 1 - 3 * SQUISH
          xsv_ext0, ysv_ext0, zsv_ext0 = xsb + 1, ysb + 1, zsb + 1
          # The other ext is based on the shared axis.
          c = a_point & b_point
          if (c & 0x01) != 0:
            dx_ext1 = dx0 - 2 - 2 * SQUISH
            dy_ext1 = dy0 - 2 * SQUISH
            dz_ext1 = dz0 - 2 * SQUISH
            xsv_ext1, ysv_ext1, zsv_ext1 = xsb + 2, ysb, zsb
          elif (c & 0x02) != 0:
            dx_ext1 = dx0 - 2 * SQUISH
            dy_ext1 = dy0 - 2 - 2 * SQUISH
            dz_ext1 = dz0 - 2 * SQUISH
            xsv_ext1, ysv_ext1, zsv_ext1 = xsb, ysb + 2, zsb
          else:
            dx_ext1 = dx0 - 2 * SQUISH
            dy_ext1 = dy0 - 2 * SQUISH
            dz_ext1 = dz0 - 2 - 2 * SQUISH
            xsv_ext1, ysv_ext1, zsv_ext1 = xsb, ysb, zsb + 2
        else:
          # Both closest points on the (0,0,0) side: one ext is (0,0,0).
          dx_ext0, dy_ext0, dz_ext0 = dx0, dy0, dz0
          xsv_ext0, ysv_ext0, zsv_ext0 = xsb, ysb, zsb
          # The other ext is based on the omitted axis.
          c = a_point | b_point
          if (c & 0x01) == 0:
            dx_ext1 = dx0 + 1 - SQUISH
            dy_ext1 = dy0 - 1 - SQUISH
            dz_ext1 = dz0 - 1 - SQUISH
            xsv_ext1, ysv_ext1, zsv_ext1 = xsb - 1, ysb + 1, zsb + 1
          elif (c & 0x02) == 0:
            dx_ext1 = dx0 - 1 - SQUISH
            dy_ext1 = dy0 + 1 - SQUISH
            dz_ext1 = dz0 - 1 - SQUISH
            xsv_ext1, ysv_ext1, zsv_ext1 = xsb + 1, ysb - 1, zsb + 1
          else:
            dx_ext1 = dx0 - 1 - SQUISH
            dy_ext1 = dy0 - 1 - SQUISH
            dz_ext1 = dz0 + 1 - SQUISH
            xsv_ext1, ysv_ext1, zsv_ext1 = xsb + 1, ysb + 1, zsb - 1
      else:
        # One point on each side: exts are a permutation of (1,1,-1) from
        # the further-side point and of (0,0,2) from the closer-side one.
        if a_is_further_side:
          c1, c2 = a_point, b_point
        else:
          c1, c2 = b_point, a_point
        if (c1 & 0x01) == 0:
          dx_ext0 = dx0 + 1 - SQUISH
          dy_ext0 = dy0 - 1 - SQUISH
          dz_ext0 = dz0 - 1 - SQUISH
          xsv_ext0, ysv_ext0, zsv_ext0 = xsb - 1, ysb + 1, zsb + 1
        elif (c1 & 0x02) == 0:
          dx_ext0 = dx0 - 1 - SQUISH
          dy_ext0 = dy0 + 1 - SQUISH
          dz_ext0 = dz0 - 1 - SQUISH
          xsv_ext0, ysv_ext0, zsv_ext0 = xsb + 1, ysb - 1, zsb + 1
        else:
          dx_ext0 = dx0 - 1 - SQUISH
          dy_ext0 = dy0 - 1 - SQUISH
          dz_ext0 = dz0 + 1 - SQUISH
          xsv_ext0, ysv_ext0, zsv_ext0 = xsb + 1, ysb + 1, zsb - 1
        dx_ext1 = dx0 - 2 * SQUISH
        dy_ext1 = dy0 - 2 * SQUISH
        dz_ext1 = dz0 - 2 * SQUISH
        xsv_ext1, ysv_ext1, zsv_ext1 = xsb, ysb, zsb
        if (c2 & 0x01) != 0:
          dx_ext1 -= 2
          xsv_ext1 += 2
        elif (c2 & 0x02) != 0:
          dy_ext1 -= 2
          ysv_ext1 += 2
        else:
          dz_ext1 -= 2
          zsv_ext1 += 2

      dx1 = dx0 - 1 - SQUISH
      dy1 = dy0 - 0 - SQUISH
      dz1 = dz0 - 0 - SQUISH
      attn1 = 2 - dx1 * dx1 - dy1 * dy1 - dz1 * dz1
      if attn1 > 0:
        attn1 *= attn1
        value = attn1 * attn1 * ext(xsb + 1, ysb, zsb, dx1, dy1, dz1)
      dx2 = dx0 - 0 - SQUISH
      dy2 = dy0 - 1 - SQUISH
      dz2 = dz1
      attn2 = 2 - dx2 * dx2 - dy2 * dy2 - dz2 * dz2
      if attn2 > 0:
        attn2 *= attn2
        value += attn2 * attn2 * ext(xsb, ysb + 1, zsb, dx2, dy2, dz2)
      dx3 = dx2
      dy3 = dy1
      dz3 = dz0 - 1 - SQUISH
      attn3 = 2 - dx3 * dx3 - dy3 * dy3 - dz3 * dz3
      if attn3 > 0:
        attn3 *= attn3
        value += attn3 * attn3 * ext(xsb, ysb, zsb + 1, dx3, dy3, dz3)
      dx4 = dx0 - 1 - 2 * SQUISH
      dy4 = dy0 - 1 - 2 * SQUISH
      dz4 = dz0 - 0 - 2 * SQUISH
      attn4 = 2 - dx4 * dx4 - dy4 * dy4 - dz4 * dz4
      if attn4 > 0:
        attn4 *= attn4
        value += attn4 * attn4 * ext(xsb + 1, ysb + 1, zsb, dx4, dy4, dz4)
      dx5 = dx4
      dy5 = dy0 - 0 - 2 * SQUISH
      dz5 = dz0 - 1 - 2 * SQUISH
      attn5 = 2 - dx5 * dx5 - dy5 * dy5 - dz5 * dz5
      if attn5 > 0:
        attn5 *= attn5
        value += attn5 * attn5 * ext(xsb + 1, ysb, zsb + 1, dx5, dy5, dz5)
      dx6 = dx0 - 0 - 2 * SQUISH
      dy6 = dy4
      dz6 = dz5
      attn6 = 2 - dx6 * dx6 - dy6 * dy6 - dz6 * dz6
      if attn6 > 0:
        attn6 *= attn6
        value += attn6 * attn6 * ext(xsb, ysb + 1, zsb + 1, dx6, dy6, dz6)

    attn_ext0 = (2 - dx_ext0 * dx_ext0 - dy_ext0 * dy_ext0
                 - dz_ext0 * dz_ext0)
    if attn_ext0 > 0:
      attn_ext0 *= attn_ext0
      value += attn_ext0 * attn_ext0 * ext(
          xsv_ext0, ysv_ext0, zsv_ext0, dx_ext0, dy_ext0, dz_ext0)
    attn_ext1 = (2 - dx_ext1 * dx_ext1 - dy_ext1 * dy_ext1
                 - dz_ext1 * dz_ext1)
    if attn_ext1 > 0:
      attn_ext1 *= attn_ext1
      value += attn_ext1 * attn_ext1 * ext(
          xsv_ext1, ysv_ext1, zsv_ext1, dx_ext1, dy_ext1, dz_ext1)
    return value / NORM

  noise3d = noise3
