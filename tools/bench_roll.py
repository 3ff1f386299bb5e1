"""Micro-bench: what does a lane roll cost inside a Pallas TPU kernel?

The round-5 byte-compaction and window-alignment ladders lean on
jnp.roll being a cheap native lane rotate (PERF.md's earlier note).
This times a kernel of R successive roll+select stages on (block, 4096)
int32 blocks against an arithmetic control of the same op count, so the
per-roll cost is measured rather than assumed.

Run: python tools/bench_roll.py [n_rows]
"""

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp


def make(kind, rolls, c=4096, block=64):
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  def kernel(x_ref, o_ref):
    x = x_ref[...]
    j = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for k in range(rolls):
      if kind == 'roll':
        x = jnp.where((j >> (k % 12)) & 1 != 0,
                      jnp.roll(x, -(1 << (k % 12)), axis=-1), x)
      elif kind == 'roll1':
        x = jnp.where((j >> (k % 12)) & 1 != 0, jnp.roll(x, -1, axis=-1),
                      x)
      else:  # arithmetic control: 2 elementwise ops like roll+select
        x = jnp.where((j >> (k % 12)) & 1 != 0, x * 3 + k, x)
    o_ref[...] = x

  def run(x):
    n = x.shape[0]
    spec = pl.BlockSpec((block, c), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(n // block,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.int32),
        interpret=jax.default_backend() != 'tpu')(x)
  return run


def main():
  n = int(_sys.argv[1]) if len(_sys.argv) > 1 else 40960
  x = jax.random.randint(jax.random.key(0), (n, 4096), 0, 1 << 24,
                         dtype=jnp.int32)
  for kind in ('ctl', 'roll', 'roll1'):
    for rolls in (10, 40):
      f = jax.jit(lambda x, k=kind, r=rolls: make(k, r)(x).sum())
      float(f(x))
      best = 1e9
      for _ in range(3):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
      print(f'{kind:5} x{rolls:3}: {best * 1000:7.2f} ms '
            f'({best * 1e6 / rolls / (n / 40960):6.2f} us/stage @40960rows)')


if __name__ == '__main__':
  main()
