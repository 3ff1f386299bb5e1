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

N_WORLDS = 8


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
  """Material and mob frequencies must match across engines."""

  def test_material_frequencies(self, ref_worlds, tpu_worlds):
    from crafter_tpu import rules
    for mid, name in [(rules.MAT_GRASS, 'grass'), (rules.MAT_WATER, 'water'),
                      (rules.MAT_STONE, 'stone'), (rules.MAT_TREE, 'tree'),
                      (rules.MAT_SAND, 'sand'), (rules.MAT_PATH, 'path')]:
      ref = (ref_worlds == mid).mean()
      got = (tpu_worlds == mid).mean()
      # Averaged over N_WORLDS*4096 cells; sigma of the mean is small but
      # worlds are spatially correlated — allow a generous band.
      assert abs(ref - got) < max(0.25 * ref, 0.01), (name, ref, got)

  def test_rare_materials_present(self, ref_worlds, tpu_worlds):
    from crafter_tpu import rules
    for mid in (rules.MAT_COAL, rules.MAT_IRON, rules.MAT_DIAMOND,
                rules.MAT_LAVA):
      ref = (ref_worlds == mid).sum() / N_WORLDS
      got = (tpu_worlds == mid).sum() / N_WORLDS
      assert got > 0.3 * ref and got < 3 * ref + 5, (mid, ref, got)

  def test_mob_populations(self, ref_worlds, tpu_worlds):
    # Semantic ids: materials end at 12; entity ids are 13+type order
    # [player, cow, zombie, skeleton, ...] (env.py:47-49).
    for off, name, tol in [(1, 'cow', 0.5), (2, 'zombie', 0.5),
                           (3, 'skeleton', 0.6)]:
      ref = (ref_worlds == 12 + off + 1).sum() / N_WORLDS
      got = (tpu_worlds == 12 + off + 1).sum() / N_WORLDS
      assert abs(got - ref) <= max(tol * ref, 3), (name, ref, got)


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
