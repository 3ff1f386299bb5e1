"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Stands in for a real pod slice (SURVEY.md §5: env batch data-parallel over
`jax.sharding`, stats reduced by XLA collectives, learner gradients
all-reduced implicitly from the global-mean loss).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from crafter_tpu.config import EnvConfig
from crafter_tpu.env import home_keys, vec_reset, vec_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 virtual devices')


def mesh8():
  return Mesh(np.array(jax.devices()[:8]), ('dp',))


class TestShardedEnv:
  def test_sharded_step_matches_single_device(self):
    cfg = EnvConfig()
    n = 16
    mesh = mesh8()
    dp = NamedSharding(mesh, P('dp'))

    vs = jax.jit(lambda: vec_reset(home_keys(0, n), cfg))()
    actions = jnp.tile(jnp.arange(8), 2).astype(jnp.int32)
    ref, out_ref, _ = jax.jit(
        lambda v, a: vec_step(v, a, cfg, 4))(vs, actions)

    svs = jax.tree.map(
        lambda x: jax.device_put(x, dp) if x.ndim and x.shape[0] == n else x,
        vs)
    got, out_got, _ = jax.jit(lambda v, a: vec_step(v, a, cfg, 4))(
        svs, jax.device_put(actions, dp))
    assert bool(jnp.all(out_ref.reward == out_got.reward))
    assert bool(jnp.all(ref.env.mat_map == got.env.mat_map))
    assert bool(jnp.all(ref.env.ent.etype == got.env.ent.etype))

  def test_stats_allreduce_over_mesh(self):
    # Cross-host stats reduction: a psum over the mesh axis via shard_map.
    from jax import shard_map
    mesh = mesh8()
    cfg = EnvConfig()
    n = 16
    vs = jax.jit(lambda: vec_reset(home_keys(0, n), cfg))()
    hp = jax.device_put(vs.env.player.inventory[:, 0],
                        NamedSharding(mesh, P('dp')))

    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=P('dp'), out_specs=P())
    def total_health(local_hp):
      return jax.lax.psum(local_hp.sum(), 'dp')[None]

    assert int(total_health(hp)[0]) == 9 * n


class TestShardMapGroupStep:
  def test_matches_single_device_group_step(self):
    """make_sharded_group_step (per-shard kernels via shard_map — the
    multi-chip product path; GSPMD cannot split a pallas_call) is
    bit-identical to the single-device group step when no per-shard
    reset overflow occurs: the same envs reset with the same fresh
    worlds (each env's world derives from its own home key)."""
    import dataclasses
    from crafter_tpu.env import vec_step_group
    from crafter_tpu.parallel.mesh import make_sharded_group_step, shard_batch

    cfg = dataclasses.replace(EnvConfig(reward=False), length=25)
    n = 32
    k = cfg.balance_every
    mesh = mesh8()
    vs = jax.jit(lambda: vec_reset(home_keys(21, n), cfg))()
    actions = jax.random.randint(jax.random.key(4), (3 * k, n), 0, 17)

    ref = vs
    step_ref = jax.jit(lambda v, a: vec_step_group(v, a, cfg, 32))
    sstep = make_sharded_group_step(mesh, cfg, 32)  # 4 slots per shard
    got = shard_batch(vs, mesh, n)
    for g in range(3):
      a = actions[g * k:(g + 1) * k]
      ref, out_ref = step_ref(ref, a)
      got, out_got = sstep(got, a)
      np.testing.assert_array_equal(np.asarray(out_ref.reward),
                                    np.asarray(out_got.reward))
      np.testing.assert_array_equal(np.asarray(out_ref.done),
                                    np.asarray(out_got.done))
    # length=25 forces episode ends inside the window; require real resets
    # so the per-shard reset path is actually exercised.
    assert int(np.asarray(got.episode).sum()) > n
    flat_r = jax.tree_util.tree_flatten_with_path(ref)[0]
    flat_g = jax.tree.leaves(got)
    for (path, x), y in zip(flat_r, flat_g):
      if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        x, y = jax.random.key_data(x), jax.random.key_data(y)
      np.testing.assert_array_equal(
          np.asarray(x), np.asarray(y),
          err_msg=jax.tree_util.keystr(path))


class TestShardedTrain:
  def test_make_sharded_train_one_update(self):
    from crafter_tpu.ppo import PPOConfig, make_sharded_train
    mesh = mesh8()
    cfg = PPOConfig(num_envs=16, rollout_len=2, epochs=1, minibatches=2,
                    reset_batch=8)
    with mesh:
      ppo, init, train_step, shard_state = make_sharded_train(
          EnvConfig(), cfg, mesh)
      ts = init(jax.random.key(0))
      ts, metrics = train_step(ts)
      jax.block_until_ready(metrics)
    assert int(ts.update) == 1
    assert np.isfinite(float(metrics['loss']))

  def test_sharded_train_reproduces_single_device(self):
    """An 8-device sharded train_step must reproduce the single-device
    run — same seeds, same time-axis minibatching — so a sharding
    regression breaks *learning*, not just finiteness (VERDICT r4 item 6).

    What is asserted, and why:
    * the post-update env batch and current frames are BIT-identical —
      the rollout (env tick + render + policy sampling) is exactly
      equivalent under sharding;
    * the full-batch loss gradient at the initial params matches to
      float tolerance — computed through a float32 clone of the policy,
      so only psum reduction ordering differs (the product model's bf16
      backward accumulates gradients in bf16, where shard-order
      reassociation legitimately moves small grads by several percent).
    Post-update *params* are deliberately not compared: Adam's first
    step is sign-like (m/sqrt(v) ~ sign(g) for near-zero gradients), so
    ulp-level reduction noise legitimately flips some parameters by the
    full learning rate (measured ~2.8*lr after one update) without any
    sharding bug."""
    from crafter_tpu import rules
    from crafter_tpu.models import CnnPolicy
    from crafter_tpu.ppo import PPO, PPOConfig, make_sharded_train
    env_cfg = EnvConfig()
    # time_minibatch pinned True on both sides: the mesh-aware default
    # would pick global shuffling on one device (a *different* algorithm).
    cfg = PPOConfig(num_envs=16, rollout_len=4, epochs=2, minibatches=2,
                    reset_batch=8, time_minibatch=True)

    def make_f32(ppo):
      """A clone whose policy computes in float32 (params-compatible)."""
      clone = PPO(ppo.env_cfg, ppo.cfg)
      clone.model = CnnPolicy(n_actions=rules.N_ACTIONS,
                              compute_dtype=jnp.float32)
      return clone

    def full_batch_grad(ppo, ts):
      """Loss + grad over the whole first rollout, no minibatching."""
      ppo = make_f32(ppo)
      ts, traj, last_value = ppo._rollout(ts)
      adv, ret = ppo._gae(traj, last_value)
      flat = lambda x: x.reshape((-1,) + x.shape[2:])
      data = jax.tree.map(flat, (traj.obs, traj.action, traj.logp, adv,
                                 ret))
      (loss, _), grads = jax.value_and_grad(ppo._loss, has_aux=True)(
          ts.params, data)
      return loss, grads

    ppo = PPO(env_cfg, cfg)
    ts_a = jax.jit(ppo.init)(jax.random.key(3))
    loss_a, grads_a = jax.jit(lambda t: full_batch_grad(ppo, t))(ts_a)
    ts_a, metrics_a = jax.jit(ppo.train_step)(ts_a)

    mesh = mesh8()
    with mesh:
      ppo_b, init, train_step, _ = make_sharded_train(env_cfg, cfg, mesh)
      ts_b = init(jax.random.key(3))
      loss_b, grads_b = jax.jit(lambda t: full_batch_grad(ppo_b, t))(ts_b)
      ts_b, metrics_b = train_step(ts_b)
      jax.block_until_ready(metrics_b)

    # Rollout equivalence is bit-exact.
    np.testing.assert_array_equal(np.asarray(ts_a.vec.env.step),
                                  np.asarray(ts_b.vec.env.step))
    np.testing.assert_array_equal(np.asarray(ts_a.vec.env.mat_map),
                                  np.asarray(ts_b.vec.env.mat_map))
    np.testing.assert_array_equal(np.asarray(ts_a.obs), np.asarray(ts_b.obs))
    assert int(metrics_a['episodes_done']) == int(metrics_b['episodes_done'])
    # Learning equivalence: same loss and same gradient field.
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-4)
    flat_a = jax.tree_util.tree_flatten_with_path(grads_a)[0]
    flat_b = jax.tree.leaves(grads_b)
    assert len(flat_a) == len(flat_b)
    scale = max(float(jnp.abs(g).max()) for g in flat_b)
    for (path, a), b in zip(flat_a, flat_b):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-6 * scale,
          err_msg=jax.tree_util.keystr(path))


class TestParallelHelpers:
  def test_psum_stats_and_shard_batch(self):
    import jax.numpy as jnp
    from crafter_tpu.parallel import dp_mesh, psum_stats, shard_batch
    mesh = dp_mesh(8)
    batch = dict(r=jnp.arange(16, dtype=jnp.float32),
                 scalar=jnp.float32(2.0))
    sharded = shard_batch(batch, mesh, 16)
    total = psum_stats(dict(x=sharded['r'].reshape(8, 2).sum(-1)), mesh)
    # Each shard reduces its local rows; psum sums across the mesh.
    assert float(total['x'][0]) == float(jnp.arange(16).sum())
