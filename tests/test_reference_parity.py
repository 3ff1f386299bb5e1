"""Live behavioral parity against the *actual* reference engine.

tests/refshim lets /root/reference/crafter import inside this sandbox (its
opensimplex + ruamel.yaml deps shimmed with numpy/pyyaml equivalents), so
these tests run both engines side by side.  RNG streams differ by design
(threefry vs one shared MT19937; SURVEY.md §7), so parity is asserted on
*distributions* — material frequencies, mob populations, deaths, early
achievements — not bitwise trajectories.
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import refshim

HAVE_REF = refshim.install()
pytestmark = pytest.mark.skipif(not HAVE_REF, reason='no reference checkout')

N_WORLDS = 32


@pytest.fixture(scope='module')
def ref_worlds():
  import crafter
  worlds = []
  for seed in range(N_WORLDS):
    env = crafter.Env(seed=seed)
    env.reset()
    sem = env._sem_view()
    worlds.append(sem)
  return np.stack(worlds)  # (N, 64, 64) material ids 1..12, entities 13+


@pytest.fixture(scope='module')
def tpu_worlds():
  import jax
  from crafter_tpu import state as state_lib, worldgen
  from crafter_tpu.config import EnvConfig
  cfg = EnvConfig()
  keys = jax.random.split(jax.random.key(0), N_WORLDS)
  batch = jax.jit(jax.vmap(lambda k: worldgen.generate_world(k, cfg)))(keys)
  sems = jax.jit(jax.vmap(lambda s: state_lib.semantic_view(s, cfg)))(batch)
  return np.asarray(sems)


class TestWorldgenDistribution:
  """Material and mob frequencies must match across engines.

  Bands are COMPUTED confidence intervals, not fixed fractions (VERDICT
  r4 weak #5): both engines are deterministic per seed, so the assertion
  compares two means of N_WORLDS per-world frequencies and bounds the
  difference by z standard errors of that difference.  At N_WORLDS=32
  this lands near ±6-10% relative for the common materials — tight
  enough to catch a ~10% worldgen skew the old ±25% bands would pass.
  """

  @staticmethod
  def _band(ref_per_world, got_per_world, z=3.5, abs_floor=0.0):
    se = np.sqrt(ref_per_world.var(ddof=1) / len(ref_per_world)
                 + got_per_world.var(ddof=1) / len(got_per_world))
    return max(z * se, abs_floor)

  def test_material_frequencies(self, ref_worlds, tpu_worlds):
    from crafter_tpu import rules
    for mid, name in [(rules.MAT_GRASS, 'grass'), (rules.MAT_WATER, 'water'),
                      (rules.MAT_STONE, 'stone'), (rules.MAT_TREE, 'tree'),
                      (rules.MAT_SAND, 'sand'), (rules.MAT_PATH, 'path')]:
      ref = (ref_worlds == mid).mean(axis=(1, 2))   # per-world frequency
      got = (tpu_worlds == mid).mean(axis=(1, 2))
      band = self._band(ref, got, abs_floor=0.002)
      assert abs(ref.mean() - got.mean()) < band, (
          name, ref.mean(), got.mean(), band)

  def test_rare_materials_present(self, ref_worlds, tpu_worlds):
    from crafter_tpu import rules
    for mid, name in [(rules.MAT_COAL, 'coal'), (rules.MAT_IRON, 'iron'),
                      (rules.MAT_DIAMOND, 'diamond'),
                      (rules.MAT_LAVA, 'lava')]:
      ref = (ref_worlds == mid).sum(axis=(1, 2)).astype(np.float64)
      got = (tpu_worlds == mid).sum(axis=(1, 2)).astype(np.float64)
      band = self._band(ref, got, abs_floor=1.5)
      assert abs(ref.mean() - got.mean()) <= band, (
          name, ref.mean(), got.mean(), band)

  def test_mob_populations(self, ref_worlds, tpu_worlds):
    # Semantic ids: materials end at 12; entity ids are 13+type order
    # [player, cow, zombie, skeleton, ...] (env.py:47-49).
    for off, name in [(1, 'cow'), (2, 'zombie'), (3, 'skeleton')]:
      ref = (ref_worlds == 12 + off + 1).sum(axis=(1, 2)).astype(np.float64)
      got = (tpu_worlds == 12 + off + 1).sum(axis=(1, 2)).astype(np.float64)
      band = self._band(ref, got, abs_floor=1.0)
      assert abs(got.mean() - ref.mean()) <= band, (
          name, ref.mean(), got.mean(), band)


class TestEarlyAchievements:
  """Two-proportion parity on early-game achievement rates (VERDICT r4
  item 4): the rates at which short random episodes unlock the common
  early achievements must agree between the live reference and the
  batched fast engine.  Proportions are compared with a two-proportion
  z-test at |z| < 4 per task (Bonferroni-safe across tasks; both engines
  are deterministic per seed, so this is a fixed, reproducible check)."""

  HORIZON = 120
  N_REF = 56
  N_TPU = 512
  TASKS = ('collect_wood', 'collect_sapling', 'collect_drink', 'eat_cow')

  @pytest.fixture(scope='class')
  def ref_rates(self):
    import crafter
    counts = {t: 0 for t in self.TASKS}
    for seed in range(self.N_REF):
      env = crafter.Env(seed=seed)
      env.reset()
      rng = np.random.RandomState(1000 + seed)
      done = False
      for _ in range(self.HORIZON):
        _, _, done, info = env.step(int(rng.randint(17)))
        if done:
          break
      ach = env._player.achievements
      for t in self.TASKS:
        counts[t] += int(ach.get(t, 0) > 0)
    return {t: counts[t] / self.N_REF for t in self.TASKS}

  @pytest.fixture(scope='class')
  def tpu_rates(self):
    import jax
    from crafter_tpu import rules
    from crafter_tpu.config import EnvConfig
    from crafter_tpu.env import home_keys, vec_reset, vec_step
    cfg = EnvConfig()
    n = self.N_TPU
    vs = jax.jit(lambda: vec_reset(home_keys(77, n), cfg))()

    @jax.jit
    def run(vs, key):
      def body(carry, _):
        vs, key, ach, fin = carry
        key, k = jax.random.split(key)
        a = jax.random.randint(k, (n,), 0, 17)
        vs, out, stepped = vec_step(vs, a, cfg, reset_batch=1)
        # Latch achievements at the first terminal tick, inclusive (the
        # reference loop above breaks AFTER the terminal step), and stay
        # latched through any auto-reset into a fresh episode.
        ach = jax.numpy.where(fin[:, None], ach,
                              stepped.player.achievements)
        fin = fin | out.done
        return (vs, key, ach, fin), None
      ach0 = vs.env.player.achievements
      fin0 = jax.numpy.zeros((n,), bool)
      (vs, _, ach, _), _ = jax.lax.scan(
          body, (vs, key, ach0, fin0), None,
          length=TestEarlyAchievements.HORIZON)
      return ach
    ach = np.asarray(run(vs, jax.random.key(123)))
    ids = {t: rules.ACHIEVEMENTS.index(t) for t in self.TASKS}
    return {t: float((ach[:, ids[t]] > 0).mean()) for t in self.TASKS}

  def test_two_proportion_parity(self, ref_rates, tpu_rates):
    for t in self.TASKS:
      p1, n1 = ref_rates[t], self.N_REF
      p2, n2 = tpu_rates[t], self.N_TPU
      pool = (p1 * n1 + p2 * n2) / (n1 + n2)
      se = np.sqrt(max(pool * (1 - pool), 1e-9) * (1 / n1 + 1 / n2))
      z = (p1 - p2) / se
      assert abs(z) < 4.0, (t, p1, p2, z)


## NOTE: the round-1 TestRandomPolicyDynamics class (death-rate band
## ±0.40, achievement bands ±0.45 over 10-episode samples) was retired in
## round 4: the exact-seed oracle (tests/test_parity_exact.py) enforces
## bitwise parity for the parity engine, and the fast engine's dynamics
## distribution is anchored by the 1M-step random-score run
## (tools/random_baseline.py, RESULTS.md) — both strictly stronger than
## those loose bands, which only added suite minutes.


class TestBalanceDynamics:
  """Chunk-balancing population dynamics over night cycles (env.py:141-179).

  Mob populations after 350 steps (through the first night) are driven
  almost entirely by the daylight-dependent spawn/despawn targets; both
  engines must land in the same range.
  """

  HORIZON2 = 250

  @pytest.fixture(scope='class')
  def ref_pops(self):
    import crafter
    zombies, cows, skeletons = [], [], []
    for seed in range(3):
      env = crafter.Env(seed=seed)
      env.reset()
      rng = np.random.RandomState(100 + seed)
      for t in range(self.HORIZON2):
        # Keep stepping past player death: the batched engine also steps
        # dead envs until their auto-reset, and mob balancing continues
        # either way (env.py:90-95 does not gate on the player living).
        env.step(int(rng.randint(17)))
      objs = env._world.objects
      import crafter.objects as o
      zombies.append(sum(isinstance(x, o.Zombie) for x in objs))
      cows.append(sum(isinstance(x, o.Cow) for x in objs))
      skeletons.append(sum(isinstance(x, o.Skeleton) for x in objs))
    return dict(z=np.mean(zombies), c=np.mean(cows), s=np.mean(skeletons))

  @pytest.fixture(scope='class')
  def tpu_pops(self):
    import jax
    import jax.numpy as jnp
    from crafter_tpu.config import EnvConfig
    from crafter_tpu.env import home_keys, vec_reset
    from crafter_tpu import step as step_lib, rules
    cfg = EnvConfig()
    n = 8
    vs = jax.jit(lambda: vec_reset(home_keys(55, n), cfg))()

    @jax.jit
    def run(env_state, key):
      def body(carry, _):
        st, key = carry
        key, k = jax.random.split(key)
        a = jax.random.randint(k, (n,), 0, 17)
        st, out = jax.vmap(lambda s, a_: step_lib.step(s, a_, cfg))(st, a)
        return (st, key), None
      (st, _), _ = jax.lax.scan(body, (env_state, key), None,
                                length=TestBalanceDynamics.HORIZON2)
      return st

    st = run(vs.env, jax.random.key(9))
    et = np.asarray(st.ent.etype)        # (n, W*H) flat planes
    return dict(z=(et == rules.E_ZOMBIE).sum(-1).mean(),
                c=(et == rules.E_COW).sum(-1).mean(),
                s=(et == rules.E_SKELETON).sum(-1).mean())

  def test_zombie_population(self, ref_pops, tpu_pops):
    # Post-night populations are dominated by balancing, high variance
    # across worlds — require the same ballpark.
    assert abs(ref_pops['z'] - tpu_pops['z']) <= max(
        0.8 * ref_pops['z'], 8), (ref_pops, tpu_pops)

  def test_cow_population(self, ref_pops, tpu_pops):
    assert abs(ref_pops['c'] - tpu_pops['c']) <= max(
        0.8 * ref_pops['c'], 8), (ref_pops, tpu_pops)

  def test_skeleton_population(self, ref_pops, tpu_pops):
    assert abs(ref_pops['s'] - tpu_pops['s']) <= max(
        0.8 * ref_pops['s'], 8), (ref_pops, tpu_pops)
