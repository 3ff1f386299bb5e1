"""PPO trainer tests (tiny shapes; CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from crafter_tpu.config import EnvConfig
from crafter_tpu.ppo import PPO, PPOConfig


def tiny():
  return PPO(EnvConfig(), PPOConfig(num_envs=4, rollout_len=4, epochs=2,
                                    minibatches=2, reset_batch=2))


class TestPPO:
  def test_train_step_runs_and_counts(self):
    ppo = tiny()
    ts = ppo.init(jax.random.key(0))
    step = jax.jit(ppo.train_step)
    ts, metrics = step(ts)
    assert int(ts.update) == 1
    assert int(ts.env_steps) == 16
    for k in ('loss', 'pg_loss', 'v_loss', 'entropy'):
      assert np.isfinite(float(metrics[k])), k

  def test_params_change_and_deterministic(self):
    ppo = tiny()
    ts0 = ppo.init(jax.random.key(0))
    step = jax.jit(ppo.train_step)
    ts1, _ = step(ts0)
    leaves0 = jax.tree.leaves(ts0.params)
    leaves1 = jax.tree.leaves(ts1.params)
    assert any(bool((a != b).any()) for a, b in zip(leaves0, leaves1))
    # Same seed twice -> identical update.
    ts1b, _ = step(ppo.init(jax.random.key(0)))
    assert all(bool(jnp.allclose(a, b)) for a, b in
               zip(jax.tree.leaves(ts1.params), jax.tree.leaves(ts1b.params)))

  def test_packed_obs_equivalence(self):
    """CnnPolicy accepts the packed int32 pixel-lane transport
    (CrafterEnv.observe_px) and produces bit-identical outputs to the
    uint8 NHWC frames of the same states."""
    from crafter_tpu.env import CrafterEnv, home_keys, vec_reset
    ppo = tiny()
    core = CrafterEnv(ppo.env_cfg)
    vec = jax.jit(vec_reset, static_argnums=1)(home_keys(2, 4), ppo.env_cfg)
    obs_u8 = core.observe_batch(vec.env)
    obs_px = core.observe_px(vec.env)
    ts = ppo.init(jax.random.key(0))
    a = ppo.model.apply(ts.params, obs_u8)
    b = ppo.model.apply(ts.params, obs_px)
    np.testing.assert_array_equal(np.asarray(a.logits), np.asarray(b.logits))
    np.testing.assert_array_equal(np.asarray(a.value), np.asarray(b.value))

  def test_entropy_near_uniform_at_init(self):
    ppo = tiny()
    ts = ppo.init(jax.random.key(0))
    out = ppo.model.apply(ts.params, ts.obs)
    probs = jax.nn.softmax(out.logits)
    ent = float(-(probs * jnp.log(probs + 1e-9)).sum(-1).mean())
    assert ent > 0.9 * float(jnp.log(17))
