"""Hardware-mode lane: Mosaic kernels vs jnp, bit-identical ON REAL TPU.

The CPU suite runs every `pallas_call` in interpret mode, which executes
the kernel trace with XLA:CPU semantics — in particular, one-hot matmuls
evaluate in fp32 there while the real MXU runs them single-pass bf16
(step.py:_balance_core documents the exactness argument).  This lane
re-asserts the kernel==jnp bit-identity claims on actual hardware, so a
Mosaic regression is caught by pytest rather than by the driver's bench:

    CRAFTER_TEST_PLATFORM=tpu python -m pytest tests -m tpu

Every test validates state advancement, mirroring bench.py's distrust of
a wedged device tunnel (PERF.md protocol).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != 'tpu',
                       reason='needs real TPU (CRAFTER_TEST_PLATFORM=tpu)'),
]

N = 64  # small batch: exercises block padding (block=32) and stays fast


@pytest.fixture(scope='module')
def cfg():
  from crafter_tpu.config import EnvConfig
  return EnvConfig(reward=False)


@pytest.fixture(scope='module')
def vs0(cfg):
  from crafter_tpu.env import home_keys, vec_reset
  vs = jax.jit(vec_reset, static_argnums=1)(home_keys(3, N), cfg)
  jax.block_until_ready(vs)
  return vs


def _assert_trees_equal(a, b, msg=''):
  flat_a = jax.tree_util.tree_flatten_with_path(a)[0]
  flat_b = jax.tree.leaves(b)
  for (path, x), y in zip(flat_a, flat_b):
    if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
      x, y = jax.random.key_data(x), jax.random.key_data(y)
    np.testing.assert_array_equal(
        np.asarray(x), np.asarray(y),
        err_msg=f'{msg}: {jax.tree_util.keystr(path)}')


class TestMosaicBitIdentity:
  def test_tick_kernel_matches_jnp(self, cfg, vs0):
    """The fused per-tick kernel (_tick_pallas) over a multi-tick rollout."""
    from crafter_tpu import step as step_lib
    sp = jax.jit(lambda s, a: step_lib.step_batch(s, a, cfg, balance=None,
                                                  engine='pallas'))
    sj = jax.jit(lambda s, a: step_lib.step_batch(s, a, cfg, balance=None,
                                                  engine='jnp'))
    a = b = vs0.env
    key = jax.random.key(11)
    for _ in range(12):
      key, k = jax.random.split(key)
      acts = jax.random.randint(k, (N,), 0, 17)
      a, oa = sp(a, acts)
      b, ob = sj(b, acts)
    assert int(jnp.sum(a.step)) == int(jnp.sum(vs0.env.step)) + 12 * N
    _assert_trees_equal(a, b, 'tick state')
    np.testing.assert_array_equal(np.asarray(oa.reward), np.asarray(ob.reward))
    np.testing.assert_array_equal(np.asarray(oa.done), np.asarray(ob.done))

  def test_group_kernel_matches_sequential(self, cfg, vs0):
    """step_group_batch + group finish vs K sequential jnp ticks."""
    from crafter_tpu.env import vec_step, vec_step_group
    k = cfg.balance_every
    cfg_pl = dataclasses.replace(cfg, engine='pallas')
    cfg_np = dataclasses.replace(cfg, engine='jnp')
    group = jax.jit(lambda v, a: vec_step_group(v, a, cfg_pl, 8))
    seq_b = jax.jit(lambda v, a: vec_step(v, a, cfg_np, 8, reset_every=k,
                                          balance=True))
    seq_n = jax.jit(lambda v, a: vec_step(v, a, cfg_np, 8, reset_every=k,
                                          balance=False))
    actions = jax.random.randint(jax.random.key(5), (2 * k, N), 0, 17)
    va = vb = vs0
    for g in range(2):
      va, outs = group(va, actions[g * k:(g + 1) * k])
      for i in range(k):
        fn = seq_b if i == k - 1 else seq_n
        vb, out, _ = fn(vb, actions[g * k + i])
        np.testing.assert_array_equal(np.asarray(outs.reward[i]),
                                      np.asarray(out.reward),
                                      err_msg=f'reward g{g} t{i}')
    assert int(jnp.sum(va.env.step >= 0)) == N  # device returned data
    _assert_trees_equal(va, vb, 'group state')

  def test_balance_kernel_matches_group_finish(self, cfg, vs0):
    """_balance_pallas (real MXU bf16 matmuls) vs vmap(balance_group_finish)."""
    from crafter_tpu import step as step_lib
    from crafter_tpu.env import vec_step
    stepf = jax.jit(lambda v, a: vec_step(v, a, cfg, 8, balance=False))
    vs, key = vs0, jax.random.key(0)
    for _ in range(6):
      key, ka = jax.random.split(key)
      vs, _, _ = stepf(vs, jax.random.randint(ka, (N,), 0, 17))
    env = vs.env
    s_bal = jax.vmap(lambda k_, s: step_lib._tick_seeds(k_, s)[2])(
        env.key, env.step)
    occ = jax.random.bernoulli(
        jax.random.key(9), 0.2, env.mat_map.shape).astype(jnp.uint8)
    ref = jax.jit(lambda e, s, o: jax.vmap(
        lambda ee, ss, oo: step_lib.balance_group_finish(ee, ss, oo, cfg))(
            e, s, o))(env, s_bal, occ)
    got = jax.jit(lambda e, s, o: step_lib._balance_pallas(e, s, o, cfg))(
        env, s_bal, occ)
    assert (np.asarray(ref.ent.etype) != np.asarray(env.ent.etype)).sum() > 0
    _assert_trees_equal(ref, got, 'balance')

  def test_noise_kernel_matches_fast(self):
    """noise2_pallas vs the jnp lax.scan formulation (ops/noise.py)."""
    from crafter_tpu.ops import noise as noise_lib
    from crafter_tpu.ops import noise_pallas
    pts = jax.random.uniform(jax.random.key(2), (4096, 2), jnp.float32,
                             -40.0, 40.0)
    seed = jnp.uint32(1234567)
    a = jax.jit(noise_pallas.noise2_pallas)(pts, seed)
    b = jax.jit(noise_lib.noise2_fast)(pts, seed)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(a).max()) > 0

  def test_render_kernel_matches_jnp(self, cfg, vs0):
    """render_frames (Mosaic) vs vmap(render_fields) on stepped states."""
    from crafter_tpu import render as render_lib
    from crafter_tpu.env import CrafterEnv, vec_step
    core = CrafterEnv(cfg)
    stepf = jax.jit(lambda v, a: vec_step(v, a, cfg, 8))
    vs, key = vs0, jax.random.key(7)
    for _ in range(8):
      key, ka = jax.random.split(key)
      vs, _, _ = stepf(vs, jax.random.randint(ka, (N,), 0, 17))
    st = vs.env
    got = jax.jit(core.observe_batch)(st)
    want = jax.jit(jax.vmap(core.observe))(st)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert np.asarray(got).any()

  def test_group_obs_matches_per_tick(self, cfg, vs0):
    """vec_step_group_obs (snapshots + fused render) vs per-tick jnp."""
    from crafter_tpu.env import CrafterEnv, vec_step_group_obs
    k = cfg.balance_every
    cfg_pl = dataclasses.replace(cfg, engine='pallas')
    cfg_np = dataclasses.replace(cfg, engine='jnp')
    core = CrafterEnv(cfg)
    fp = jax.jit(lambda v, a: vec_step_group_obs(v, a, cfg_pl, 8, core))
    fj = jax.jit(lambda v, a: vec_step_group_obs(v, a, cfg_np, 8, core))
    actions = jax.random.randint(jax.random.key(13), (k, N), 0, 17)
    va, oa, obs_a = fp(vs0, actions)
    vb, ob, obs_b = fj(vs0, actions)
    np.testing.assert_array_equal(np.asarray(obs_a), np.asarray(obs_b))
    _assert_trees_equal(va, vb, 'group-obs state')


class TestBenchSmoke:
  def test_short_group_loop_advances(self, cfg, vs0):
    """A bench-like scan advances every env (the advancement check a
    wedged tunnel cannot fake, PERF.md protocol)."""
    from crafter_tpu.env import vec_step_group
    k = cfg.balance_every

    @jax.jit
    def loop(vs, key):
      def body(carry, _):
        vs, key = carry
        key, ka = jax.random.split(key)
        a = jax.random.randint(ka, (k, N), 0, 17)
        vs, outs = vec_step_group(vs, a, cfg, 8)
        return (vs, key), outs.done.sum()
      (vs, key), d = jax.lax.scan(body, (vs, key), None, length=4)
      return vs, d.sum()

    vs1, d = loop(vs0, jax.random.key(1))
    float(d)  # host copy: the only reliable completion barrier
    stepped = (vs1.env.step - vs0.env.step) == 4 * k
    reset = vs1.episode > vs0.episode
    assert bool(jnp.all(stepped | reset))
