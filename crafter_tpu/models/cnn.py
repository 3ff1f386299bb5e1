"""CNN actor-critic policy for pixel observations.

The reference trains SB3's ``CnnPolicy`` (NatureCNN trunk) on the env
(reference: examples/run_ppo.py:15-21); its published Crafter score is
4.6 ± 0.3 (README.md:138).  This is the TPU-native equivalent: same trunk
shape, but bfloat16 compute so the convolutions run on the MXU, with
float32 parameters and float32 heads for numerical stability.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PolicyOutput:
  logits: jax.Array  # (..., n_actions) float32
  value: jax.Array   # (...,) float32


class CnnPolicy(nn.Module):
  """NatureCNN trunk (8x8/4, 4x4/2, 3x3/1 convs + 512 dense) + two heads.

  Accepts either standard (..., H, W, 3) uint8 frames or the training
  pipeline's packed transport format: (..., H*W) int32 lanes holding
  r|g<<8|b<<16 per pixel (crafter_tpu.render.render_frames packed_out /
  CrafterEnv.observe_px) — the unpack fuses into the input cast, keeping
  uint8 NHWC relayouts out of the rollout/minibatch hot loops.
  """

  n_actions: int = 17
  width: int = 512
  input_hw: Any = (64, 64)
  compute_dtype: Any = jnp.bfloat16

  @nn.compact
  def __call__(self, obs: jax.Array) -> PolicyOutput:
    if obs.dtype == jnp.int32:  # packed pixel lanes
      h, w = self.input_hw
      obs = jnp.stack([obs & 255, (obs >> 8) & 255, (obs >> 16) & 255],
                      -1).reshape(obs.shape[:-1] + (h, w, 3))
    x = obs.astype(self.compute_dtype) / 255.0
    kw = dict(dtype=self.compute_dtype, param_dtype=jnp.float32)
    x = nn.relu(nn.Conv(32, (8, 8), strides=4, padding='VALID', **kw)(x))
    x = nn.relu(nn.Conv(64, (4, 4), strides=2, padding='VALID', **kw)(x))
    x = nn.relu(nn.Conv(64, (3, 3), strides=1, padding='VALID', **kw)(x))
    x = x.reshape(x.shape[:-3] + (-1,))
    x = nn.relu(nn.Dense(self.width, **kw)(x))
    x = x.astype(jnp.float32)
    logits = nn.Dense(self.n_actions, param_dtype=jnp.float32)(x)
    value = nn.Dense(1, param_dtype=jnp.float32)(x)[..., 0]
    return PolicyOutput(logits=logits, value=value)
