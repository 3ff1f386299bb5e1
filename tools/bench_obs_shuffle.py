"""Micro-bench: layouts for the PPO minibatch obs gather + cast.

The learn-stage profile (tools/profile_learn.py) shows the obs shuffle
machinery — random row gathers of (B, 64, 64, 3) uint8 frames plus the
u8 -> bf16/255 cast — costing ~212 ms of a 614 ms update at 4096x64,
~16x the HBM roofline for the bytes moved (the known u8 minor-dim-3
layout inflation, PERF.md).  Candidates, each timed as gather-per-
minibatch + cast-to-bf16-NHWC + consume (sum), one epoch = M minibatches:

  nhwc    (B, 64, 64, 3) u8 rows, gather + convert/255        (current)
  flat    (B, 12288) u8 rows, gather, reshape+convert in-loss
  packed  (B, 4096) int32 r|g<<8|b<<16, gather, unpack in-loss
  epoch   nhwc, but ONE whole-batch gather per epoch + static slices

    python tools/bench_obs_shuffle.py --batch 262144 --minibatches 8
"""

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import time


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--batch', type=int, default=262144)
  parser.add_argument('--minibatches', type=int, default=8)
  parser.add_argument('--reps', type=int, default=3)
  args = parser.parse_args()

  from crafter_tpu.utils import apply_platform_env, enable_compile_cache
  apply_platform_env()
  enable_compile_cache()
  import jax
  import jax.numpy as jnp

  b, m = args.batch, args.minibatches
  mb = b // m
  key = jax.random.key(0)

  @jax.jit
  def setup(key):
    flat = jax.random.bits(key, (b, 12288), jnp.uint8)
    nhwc = flat.reshape(b, 64, 64, 3)
    # packed int32 lanes r|g<<8|b<<16: zero the 4th byte, bitcast.
    quad = jnp.concatenate(
        [flat.reshape(b, 4096, 3),
         jnp.zeros((b, 4096, 1), jnp.uint8)], -1)
    packed = jax.lax.bitcast_convert_type(quad, jnp.int32)
    return flat, nhwc, packed

  flat, nhwc, packed = setup(key)
  float(packed[0, 0])

  def consume(x):  # the model's input stage: bf16 NHWC / 255
    return (x.astype(jnp.bfloat16) / 255.0).sum(dtype=jnp.float32)

  @jax.jit
  def run_nhwc(data, perm):
    idxs = perm.reshape(m, mb)
    def body(s, idx):
      return s + consume(data[idx]), None
    return jax.lax.scan(body, 0.0, idxs)[0]

  @jax.jit
  def run_flat(data, perm):
    idxs = perm.reshape(m, mb)
    def body(s, idx):
      x = data[idx].reshape(mb, 64, 64, 3)
      return s + consume(x), None
    return jax.lax.scan(body, 0.0, idxs)[0]

  @jax.jit
  def run_packed(data, perm):
    idxs = perm.reshape(m, mb)
    def body(s, idx):
      w = data[idx]
      x = jax.lax.bitcast_convert_type(w, jnp.uint8)[..., :3]
      x = x.reshape(mb, 64, 64, 3)
      return s + consume(x), None
    return jax.lax.scan(body, 0.0, idxs)[0]

  @jax.jit
  def run_epoch(data, perm):
    shuf = data[perm]
    def body(s, i):
      x = jax.lax.dynamic_slice_in_dim(shuf, i * mb, mb)
      return s + consume(x), None
    return jax.lax.scan(body, 0.0, jnp.arange(m))[0]

  @jax.jit
  def run_contig(data, perm):
    # Lower bound: no shuffle at all — contiguous minibatch slices.
    def body(s, i):
      x = jax.lax.dynamic_slice_in_dim(data, i * mb, mb)
      return s + consume(x), None
    return jax.lax.scan(body, 0.0, jnp.arange(m))[0]

  @jax.jit
  def run_nhwc_sorted(data, perm):
    # Same minibatch PARTITION, indices sorted within each minibatch:
    # membership is still a uniform random partition (order inside a
    # minibatch is irrelevant to SGD), but the gather walks HBM nearly
    # sequentially.
    idxs = jnp.sort(perm.reshape(m, mb), axis=1)
    def body(s, idx):
      return s + consume(data[idx]), None
    return jax.lax.scan(body, 0.0, idxs)[0]

  @jax.jit
  def run_flat_sorted(data, perm):
    idxs = jnp.sort(perm.reshape(m, mb), axis=1)
    def body(s, idx):
      x = data[idx].reshape(mb, 64, 64, 3)
      return s + consume(x), None
    return jax.lax.scan(body, 0.0, idxs)[0]

  @jax.jit
  def run_flat_once3(data, perm):
    # The once-per-UPDATE scheme: one whole-batch flat gather, then 3
    # epochs of contiguous minibatch slices over the shuffled copy
    # (minibatch COMPOSITION is fixed across the update's epochs; order
    # within/among minibatches is irrelevant or freely permutable).
    shuf = data[perm]
    def epoch_body(s, _):
      def body(s, i):
        x = jax.lax.dynamic_slice_in_dim(shuf, i * mb, mb)
        x = x.reshape(mb, 64, 64, 3)
        return s + consume(x), None
      return jax.lax.scan(body, s, jnp.arange(m))[0], None
    return jax.lax.scan(epoch_body, 0.0, None, length=3)[0]

  perm = jax.random.permutation(jax.random.key(1), b)
  cases = [('nhwc', run_nhwc, nhwc), ('flat', run_flat, flat),
           ('packed', run_packed, packed), ('epoch', run_epoch, nhwc),
           ('contig', run_contig, nhwc),
           ('nhwc_sorted', run_nhwc_sorted, nhwc),
           ('flat_sorted', run_flat_sorted, flat),
           ('flat_once3', run_flat_once3, flat)]
  for name, fn, data in cases:
    float(fn(data, perm))  # compile + warmup
    best = float('inf')
    for _ in range(args.reps):
      t0 = time.perf_counter()
      float(fn(data, perm))
      best = min(best, time.perf_counter() - t0)
    print(f'{name:<8} {best * 1000:8.1f} ms/epoch '
          f'({best * 1000 * 3:8.1f} ms per 3-epoch update)')


if __name__ == '__main__':
  main()
