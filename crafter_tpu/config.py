"""Static environment configuration.

Mirrors the reference Env constructor arguments ``area/view/size/reward/
length/seed`` (reference: crafter/env.py:27-29) plus TPU-specific knobs
(kernel backends, balance cadence).  All fields are hashable so a config
can be a static argument to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

from . import rules


@dataclasses.dataclass(frozen=True)
class EnvConfig:
  """Frozen, hashable env configuration (static under jit)."""

  area: Tuple[int, int] = (64, 64)     # world size in cells (env.py:28)
  view: Tuple[int, int] = (9, 9)       # view grid incl. item rows (env.py:28)
  size: Tuple[int, int] = (64, 64)     # observation pixels (env.py:28)
  reward: bool = True                  # reward vs NoReward variant (env.py:29)
  length: int = 10000                  # episode cap (env.py:28-29)
  # TPU-specific static knobs -------------------------------------------
  chunk_size: Tuple[int, int] = (12, 12)  # env.py:40
  day_length: int = 300                # daylight period (env.py:135-139)
  balance_every: int = 10              # chunk-balance cadence (env.py:90)
  # Worldgen noise gradient hash: 'pallas' = the candidate loop fused into
  # one Pallas kernel (ops/noise_pallas.py), 'fast' = the same arithmetic
  # as a lax.scan (pure jnp), 'compat' = the original OpenSimplex 256-entry
  # permutation table (ops/noise.py), 'auto' = pallas on TPU backends else
  # fast.  'pallas' and 'fast' bit-agree; all are distribution-equivalent.
  noise_mode: str = 'auto'
  # Batched tick engine: 'pallas' fuses the whole mob phase into one TPU
  # kernel (every intermediate in VMEM; bit-identical to 'jnp' — same
  # _mob_core trace), 'jnp' vmaps the per-env step, 'auto' picks pallas on
  # TPU backends.
  engine: str = 'auto'

  def __post_init__(self):
    # The balance kernel's segmented prefix-count ladder uses static
    # (1,2,4,8) log-step shifts and packs per-chunk member counts into
    # 8-bit fields of an int32 lane (step.py:_balance_core); both are only
    # correct for chunk dims <= 16 and csx*csy <= 255 (a count of 256
    # would overflow an 8-bit prefix-count field).
    csx, csy = self.chunk_size
    if csx > 16 or csy > 16 or csx * csy > 255:
      raise ValueError(
          f'chunk_size={self.chunk_size} exceeds the (16, 16)-dim / '
          '255-cell limit of the balance kernel\'s shift ladders and '
          '8-bit prefix-count fields (step.py:_balance_core)')

  @property
  def item_rows(self) -> int:
    # env.py:42: rows of the inventory strip under the local view.
    return math.ceil(rules.N_ITEMS / self.view[0])

  @property
  def local_grid(self) -> Tuple[int, int]:
    # env.py:43-44: local view grid (columns, rows).
    return (self.view[0], self.view[1] - self.item_rows)

  @property
  def update_distance(self) -> int:
    # env.py:88: entities update within L1 distance < 2 * max(view).
    return 2 * max(self.view)

  @property
  def n_chunks(self) -> Tuple[int, int]:
    return (math.ceil(self.area[0] / self.chunk_size[0]),
            math.ceil(self.area[1] / self.chunk_size[1]))

  @property
  def center(self) -> Tuple[int, int]:
    # env.py:71: player spawn at world center.
    return (self.area[0] // 2, self.area[1] // 2)


DEFAULT_CONFIG = EnvConfig()
