"""Environment API tests: Gym surface, batching consistency, auto-reset."""

import jax
import jax.numpy as jnp
import numpy as np

import crafter_tpu
from crafter_tpu import rules
from crafter_tpu.config import EnvConfig
from crafter_tpu.env import CrafterEnv, VecEnv


class TestGymSurface:
  def test_spaces(self):
    # env.py:58-68.
    env = crafter_tpu.Env(seed=0)
    assert env.observation_space.shape == (64, 64, 3)
    assert env.observation_space.dtype == np.uint8
    assert env.action_space.n == 17
    assert env.action_names[0] == 'noop'
    assert len(env.action_names) == 17

  def test_reset_step_contract(self):
    env = crafter_tpu.Env(seed=0)
    obs = env.reset()
    assert obs.shape == (64, 64, 3) and obs.dtype == np.uint8
    obs, reward, done, info = env.step(0)
    assert isinstance(reward, float) and isinstance(done, bool)
    for key in ('inventory', 'achievements', 'discount', 'semantic',
                'player_pos', 'reward'):
      assert key in info, key
    assert info['inventory']['health'] == 9
    assert set(info['achievements']) == set(rules.ACHIEVEMENTS)
    assert info['semantic'].shape == (64, 64)
    assert info['discount'] == 1.0

  def test_noreward_variant_keeps_info_reward(self):
    # env.py:116-117.
    env = crafter_tpu.Env(seed=0, reward=False)
    env.reset()
    # Walk into a tree for a guaranteed eventual unlock is fiddly; instead
    # check that returned reward is always exactly 0.0.
    for a in [1, 2, 3, 4, 5]:
      _, reward, _, info = env.step(a)
      assert reward == 0.0
      assert isinstance(info['reward'], float)

  def test_same_seed_same_episode(self):
    a, b = crafter_tpu.Env(seed=7), crafter_tpu.Env(seed=7)
    oa, ob = a.reset(), b.reset()
    assert (oa == ob).all()
    for i in range(20):
      ra = a.step(i % 17)
      rb = b.step(i % 17)
      assert (ra[0] == rb[0]).all() and ra[1] == rb[1] and ra[2] == rb[2]

  def test_different_episodes_differ(self):
    env = crafter_tpu.Env(seed=3)
    o1 = env.reset()
    o2 = env.reset()
    assert (o1 != o2).any()


class TestFunctionalCore:
  def test_vmap_consistency(self):
    """Env i of a batch must equal the same env stepped alone (SURVEY §4c)."""
    core = CrafterEnv(EnvConfig())
    keys = jax.random.split(jax.random.key(0), 4)
    states, _ = jax.vmap(core.reset)(keys)
    actions = jnp.asarray([0, 1, 5, 6])
    bstates, bobs, brew, bdone, _ = jax.vmap(core.step)(states, actions)
    for i in range(4):
      s_i = jax.tree.map(lambda x: x[i], states)
      s1, o1, r1, d1, _ = core.step(s_i, actions[i])
      assert bool(jnp.all(o1 == bobs[i]))
      assert float(r1) == float(brew[i])
      assert jax.tree.all(jax.tree.map(
          lambda a, b: bool(jnp.all(a == b)), s1,
          jax.tree.map(lambda x: x[i], bstates)))

  def test_jit_stability(self):
    core = CrafterEnv(EnvConfig())
    reset = jax.jit(core.reset)
    step = jax.jit(core.step)
    s, o = reset(jax.random.key(0))
    for i in range(3):
      s, o, r, d, info = step(s, jnp.int32(i))
    assert o.shape == (64, 64, 3)


class TestVecEnv:
  def test_autoreset_on_length(self):
    cfg = EnvConfig(length=10)
    env = VecEnv(num_envs=8, cfg=cfg, seed=0, reset_batch=8)
    env.reset()
    done_total = 0
    for i in range(25):
      _, _, done, _ = env.step(np.zeros(8, np.int64))
      done_total += int(np.asarray(done).sum())
    # Every env hits the 10-step cap twice in 25 steps.
    assert done_total == 16
    assert (np.asarray(env.state.episode) == 3).all()
    assert (np.asarray(env.state.env.step) == 5).all()

  def test_autoreset_overflow_defers(self):
    cfg = EnvConfig(length=10)
    env = VecEnv(num_envs=8, cfg=cfg, seed=0, reset_batch=2)
    env.reset()
    for i in range(10):
      _, _, done, _ = env.step(np.zeros(8, np.int64))
    assert int(np.asarray(done).sum()) == 8   # all finished together
    # Only 2 were reset; the others report done again next step.
    _, _, done, _ = env.step(np.zeros(8, np.int64))
    assert int(np.asarray(done).sum()) == 6
    episodes = np.asarray(env.state.episode)
    assert episodes.sum() == 8 + 4

  def test_ended_pulses_once_per_episode(self):
    """`info['ended']` fires exactly once per episode even when envs queue
    for an auto-reset slot, while `done` stays latched — stats keyed on
    `done` would re-count a waiting env's achievements every tick."""
    cfg = EnvConfig(length=10)
    env = VecEnv(num_envs=8, cfg=cfg, seed=0, reset_batch=2)
    env.reset()
    ended_total = 0
    done_total = 0
    for i in range(24):
      _, _, done, info = env.step(np.zeros(8, np.int64))
      ended_total += int(np.asarray(info['ended']).sum())
      done_total += int(np.asarray(done).sum())
    # Each completed episode ends exactly once; with reset_batch=2 the
    # 8-env length-cap wave drains over 4 ticks, so `done` (latched)
    # fires many more times than `ended`.
    episodes_started = int(np.asarray(env.state.episode).sum())
    in_flight_done = int(np.asarray(env.state.pending).sum())
    assert ended_total == episodes_started - 8 + in_flight_done
    assert done_total > ended_total

  def test_reset_every_cadence(self):
    """With reset_every=K the reset pass lands only on every K-th tick;
    finished envs wait latched (same machinery as reset_batch overflow),
    and each episode is still counted exactly once."""
    from crafter_tpu.env import home_keys, vec_reset, vec_step
    import jax
    cfg = EnvConfig(length=10)
    n = 8
    vs = jax.jit(vec_reset, static_argnums=1)(home_keys(0, n), cfg)
    step = jax.jit(lambda v, a: vec_step(v, a, cfg, n, reset_every=4))
    ended_total = 0
    for i in range(24):
      prev_ep = np.asarray(vs.episode)
      vs, out, _ = step(vs, np.zeros(n, np.int64))
      ended_total += int(np.asarray(out.ended).sum())
      resets = int((np.asarray(vs.episode) != prev_ep).sum())
      if (i + 1) % 4 != 0:
        assert resets == 0, (i, resets)   # off-cadence: everyone waits
    # All envs hit the 10-step cap twice; the cap tick (10, 20) is never
    # a multiple of 4, so each wave waits 2 ticks for its reset pass.
    assert ended_total == 16
    assert (np.asarray(vs.episode) == 3).all()

  def test_vec_step_k_matches_static_unroll(self):
    """vec_step_k == K sequential vec_step calls with static balance flags
    (balance on the group's last tick), leaf for leaf.  balance_every=4:
    the equivalence is K-agnostic and the default K=10 unrolled engine
    program takes tens of minutes of XLA CPU compile."""
    from crafter_tpu.env import home_keys, vec_reset, vec_step, vec_step_k
    import jax
    cfg = EnvConfig(length=25, balance_every=4)
    n, k = 8, cfg.balance_every
    vs0 = jax.jit(vec_reset, static_argnums=1)(home_keys(3, n), cfg)
    actions = np.asarray(
        jax.random.randint(jax.random.key(7), (2 * k, n), 0, 17))

    grouped = jax.jit(lambda v, a: vec_step_k(v, a, cfg, n))
    # Two jitted closures, one per static balance flag: eager vec_step is
    # ~2 min/call on CPU, which made this test effectively un-runnable.
    step_bal = jax.jit(lambda v, a: vec_step(v, a, cfg, n, balance=True))
    step_nobal = jax.jit(lambda v, a: vec_step(v, a, cfg, n, balance=False))
    va, vb = vs0, vs0
    outs_seq = []
    for g in range(2):
      va, outs = grouped(va, actions[g * k:(g + 1) * k])
      for i in range(k):
        fn = step_bal if i == k - 1 else step_nobal
        vb, out, _ = fn(vb, actions[g * k + i])
        outs_seq.append(out)
      got = jax.tree.map(np.asarray, outs)
      want = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                          *outs_seq[g * k:])
      assert (got.reward == want.reward).all()
      assert (got.done == want.done).all()
    for la, lb in zip(jax.tree.leaves(va), jax.tree.leaves(vb)):
      if jax.dtypes.issubdtype(la.dtype, jax.dtypes.prng_key):
        la, lb = jax.random.key_data(la), jax.random.key_data(lb)
      assert (np.asarray(la) == np.asarray(lb)).all()

  def test_vec_step_k_matches_dynamic_cadence(self):
    """For a tick-aligned caller (vs.tick % K == 0), one vec_step_k group
    == K ticks of the original balance=None lax.cond path: the dynamic
    cadence fires on the group's last tick (tick % K == 0), exactly where
    the static unroll places it.  Guards the equivalence bench.py and
    profile_summary.py rely on.  balance_every=4 for compile time (see
    test_vec_step_k_matches_static_unroll)."""
    from crafter_tpu.env import home_keys, vec_reset, vec_step, vec_step_k
    import jax
    cfg = EnvConfig(length=25, balance_every=4)
    n, k = 8, cfg.balance_every
    vs0 = jax.jit(vec_reset, static_argnums=1)(home_keys(5, n), cfg)
    assert int(vs0.tick) == 0
    actions = np.asarray(
        jax.random.randint(jax.random.key(11), (2 * k, n), 0, 17))

    grouped = jax.jit(lambda v, a: vec_step_k(v, a, cfg, n))
    dyn = jax.jit(lambda v, a: vec_step(v, a, cfg, n))  # balance=None
    va, vb = vs0, vs0
    for g in range(2):
      va, outs = grouped(va, actions[g * k:(g + 1) * k])
      for i in range(k):
        vb, out, _ = dyn(vb, actions[g * k + i])
        for ga, gb in zip(jax.tree.leaves(jax.tree.map(
            lambda x: x[i], outs)), jax.tree.leaves(out)):
          assert (np.asarray(ga) == np.asarray(gb)).all()
    for la, lb in zip(jax.tree.leaves(va), jax.tree.leaves(vb)):
      if jax.dtypes.issubdtype(la.dtype, jax.dtypes.prng_key):
        la, lb = jax.random.key_data(la), jax.random.key_data(lb)
      assert (np.asarray(la) == np.asarray(lb)).all()

  def test_obs_batch_shape_and_reward(self):
    env = VecEnv(num_envs=4, seed=0)
    obs = env.reset()
    assert obs.shape == (4, 64, 64, 3)
    obs, reward, done, info = env.step(np.asarray([0, 1, 2, 3]))
    assert reward.shape == (4,)
    assert info['semantic'].shape == (4, 64, 64)


class TestGymnasiumAdapter:
  def test_registered_env_five_tuple(self):
    import gymnasium
    import crafter_tpu
    crafter_tpu.register_gym_envs()
    env = gymnasium.make('CrafterNoReward-v1')
    obs, info = env.reset(seed=3)
    assert obs.shape == (64, 64, 3)
    obs, reward, terminated, truncated, info = env.step(0)
    assert reward == 0.0 and not terminated
    assert 'semantic' in info

  def test_old_gym_registration(self, monkeypatch):
    """The reference registers against old gym (crafter/__init__.py:4-17);
    with gym absent here, verify the same ids register through a minimal
    shim of old gym's registration surface."""
    import sys
    import types
    import crafter_tpu
    registered = {}
    fake = types.ModuleType('gym')
    fake.envs = types.SimpleNamespace(registry=types.SimpleNamespace(
        env_specs={}))
    fake.register = lambda id, **kw: registered.__setitem__(id, kw)
    monkeypatch.setitem(sys.modules, 'gym', fake)
    crafter_tpu.register_gym_envs()
    assert registered['CrafterReward-v1']['kwargs'] == {'reward': True}
    assert registered['CrafterNoReward-v1']['kwargs'] == {'reward': False}
    assert registered['CrafterReward-v1']['max_episode_steps'] == 10000


class TestVecEnvSpaces:
  def test_spaces_exposed(self):
    env = VecEnv(num_envs=2, seed=0)
    assert env.single_action_space.n == 17
    assert env.single_observation_space.shape == (64, 64, 3)
    assert env.action_names[5] == 'do'


def test_run_gui_importable_and_keymap():
  import os
  os.environ.setdefault('SDL_VIDEODRIVER', 'dummy')
  import pygame
  pygame.init()   # key_code warns (and may misreport) before init
  from crafter_tpu import run_gui
  keymap = {pygame.key.key_code(k): v
            for k, v in run_gui.KEYMAP_NAMES.items()}
  assert len(keymap) == 16  # all actions except noop
  assert keymap[pygame.K_SPACE] == 'do'
