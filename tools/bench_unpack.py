"""Micro-bench: packed int32 RGB lanes -> NHWC uint8 frame variants.

The pixel pipeline's last stage converts the render kernel's (B, C) int32
r|g<<8|b<<16 lanes into (B, H, W, 3) uint8 frames.  Round 4 measured the
bitcast+slice formulation at ~4 ms/group (40960 frames) — a 3x multiple
of the ~1.4 ms HBM roofline for the 1.17 GB it moves.  This tool times
the candidates on the local accelerator so the product path carries the
measured winner:

  U0  bitcast -> (B, C, 4) u8 -> slice [..., :3] -> reshape
  U1  int32 word compaction: 4 strided reads per 4-pixel group packed
      into 3 output words (the exact byte stream of the NHWC u8 buffer),
      then one bitcast — no u8-minor-dim slice anywhere.

Run: python tools/bench_unpack.py [frames]
"""

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np


def u0(px, size):
  b = jax.lax.bitcast_convert_type(px, jnp.uint8)
  return b[..., :3].reshape(px.shape[:-1] + (size[1], size[0], 3))


def u1(px, size):
  c = px.shape[-1]
  p4 = px.reshape(px.shape[:-1] + (c // 4, 4))
  p0, p1, p2, p3 = (p4[..., i] for i in range(4))
  w0 = p0 | (p1 << 24)
  w1 = jax.lax.shift_right_logical(p1, 8) | (p2 << 16)
  w2 = jax.lax.shift_right_logical(p2, 16) | (p3 << 8)
  words = jnp.stack([w0, w1, w2], axis=-1).reshape(
      px.shape[:-1] + (3 * c // 4,))
  b = jax.lax.bitcast_convert_type(words, jnp.uint8)
  return b.reshape(px.shape[:-1] + (size[1], size[0], 3))


def main():
  n = int(_sys.argv[1]) if len(_sys.argv) > 1 else 40960
  size = (64, 64)
  c = size[0] * size[1]
  key = jax.random.key(0)
  px = jax.random.randint(key, (n, c), 0, 1 << 24, dtype=jnp.int32)

  a = np.asarray(jax.jit(u0, static_argnums=1)(px, size))
  b = np.asarray(jax.jit(u1, static_argnums=1)(px, size))
  np.testing.assert_array_equal(a, b)
  print('U0 == U1 bitwise on', n, 'frames')

  # Consumption sums every output byte (a [0,0,0] probe lets XLA narrow
  # the whole unpack to one lane — the round-3 phantom, PERF.md), and each
  # iteration xors the input with a carry-derived scalar so LICM cannot
  # hoist the loop-invariant body.  The xor+sum overhead is identical
  # across variants ('ctl' measures it: bitcast-only sum, no compaction).
  def ctl(px, size):
    return jax.lax.bitcast_convert_type(px, jnp.uint8).reshape(
        px.shape[:-1] + (size[1], size[0], 4))

  for name, fn in (('ctl', ctl), ('U0', u0), ('U1', u1)):
    @jax.jit
    def loop(px, fn=fn):
      def body(s, _):
        o = fn(px ^ (s & 1), size)
        return o.astype(jnp.int32).sum(), None
      return jax.lax.scan(body, jnp.int32(0), None, length=20)[0]
    float(loop(px))  # compile + warmup
    best = 1e9
    for _ in range(3):
      t0 = time.perf_counter()
      float(loop(px))
      best = min(best, (time.perf_counter() - t0) / 20)
    print(f'{name}: {best * 1000:.2f} ms / {n} frames (incl. xor+sum)')


if __name__ == '__main__':
  main()
