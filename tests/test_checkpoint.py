"""Checkpoint/resume round-trips (SURVEY §5: absent in the reference)."""

import jax
import jax.numpy as jnp
import numpy as np

from crafter_tpu.checkpoint import Checkpointer
from crafter_tpu.config import EnvConfig
from crafter_tpu.env import home_keys, vec_reset, vec_step


class TestCheckpoint:
  def test_env_state_roundtrip_mid_episode(self, tmp_path):
    cfg = EnvConfig()
    vs = jax.jit(lambda: vec_reset(home_keys(0, 2), cfg))()
    for i in range(3):
      vs, out, _ = jax.jit(lambda v, a: vec_step(v, a, cfg, 1))(
          vs, jnp.asarray([i % 17, (i + 3) % 17]))
    ck = Checkpointer(tmp_path / 'ck')
    ck.save(3, vs)
    restored = ck.restore_latest(vs)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.all(jnp.asarray(a) == jnp.asarray(b))),
        vs, restored))
    # Resumed state steps identically (bit-exact resume).
    a1, _, _ = jax.jit(lambda v, a: vec_step(v, a, cfg, 1))(
        vs, jnp.asarray([0, 1]))
    a2, _, _ = jax.jit(lambda v, a: vec_step(v, a, cfg, 1))(
        restored, jnp.asarray([0, 1]))
    assert bool(jnp.all(a1.env.mat_map == a2.env.mat_map))
    assert bool(jnp.all(a1.env.ent.etype == a2.env.ent.etype))

  def test_latest_step_tracking(self, tmp_path):
    ck = Checkpointer(tmp_path / 'ck')
    assert ck.latest_step is None
    state = {'x': jnp.arange(4)}
    ck.save(1, state)
    ck.save(5, state)
    assert ck.latest_step == 5
    out = ck.restore_latest(state)
    assert (np.asarray(out['x']) == np.arange(4)).all()
