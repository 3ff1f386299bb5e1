"""Worldgen kernel tests: structure, determinism, batching, distributions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crafter_tpu import rules, worldgen
from crafter_tpu.config import EnvConfig

CFG = EnvConfig()


@pytest.fixture(scope='module')
def world():
  return jax.jit(worldgen.generate_world, static_argnums=1)(
      jax.random.PRNGKey(0), CFG)


def test_shapes_and_player(world):
  assert world.mat_map.shape == (64 * 64,)  # planes are stored flat
  assert world.ent.etype.shape == (64 * 64,)
  # Player at center (env.py:71,76-78).
  assert world.ent.etype[32 * 64 + 32] == rules.E_PLAYER
  assert tuple(world.player.pos) == (32, 32)
  assert world.player.inventory[rules.ITEM_HEALTH] == 9


def test_spawn_area_is_grass(world):
  # start-area sigmoid forces grass near spawn (worldgen.py:25-33).
  m = np.asarray(world.mat_map).reshape(64, 64)
  center = m[30:35, 30:35]
  assert (center == rules.MAT_GRASS).mean() > 0.9


def test_material_distribution(world):
  m = np.asarray(world.mat_map)
  counts = {name: (m == rules.MAT_ID[name]).sum() for name in rules.MATERIALS}
  assert counts['grass'] > 200
  assert counts['stone'] > 100          # mountains exist
  assert counts['water'] + counts['sand'] > 20
  assert counts['tree'] > 3
  assert counts['table'] == 0 and counts['furnace'] == 0  # crafted only
  assert (m != 0).all()                 # every cell gets a material


def test_entity_channels_consistent(world):
  # A cell is an entity iff etype is set; channels agree with spawn rules.
  et = np.asarray(world.ent.etype)
  assert ((et == 0) | (et <= rules.E_PLANT)).all()
  assert (np.asarray(world.ent.aux) == 0).all()      # fresh world: no timers
  assert (np.asarray(world.ent.facing) == 0).all()   # no arrows yet
  assert (np.asarray(world.ent.health)[et == 0] == 0).all()


def test_mob_spawn_rules(world):
  et = np.asarray(world.ent.etype).reshape(64, 64)
  m = np.asarray(world.mat_map).reshape(64, 64)
  xs, ys = np.meshgrid(np.arange(64), np.arange(64), indexing='ij')
  dist = np.sqrt((xs - 32.0) ** 2 + (ys - 32.0) ** 2)
  cow, zom, skel = (et == rules.E_COW), (et == rules.E_ZOMBIE), (
      et == rules.E_SKELETON)
  assert (m[cow] == rules.MAT_GRASS).all()   # worldgen.py:71
  assert (dist[cow] > 3).all()
  assert (dist[zom] > 10).all()              # worldgen.py:73
  assert (m[skel] == rules.MAT_PATH).all()   # worldgen.py:75
  # Initial healths (objects.py:267,286,319).
  h = np.asarray(world.ent.health).reshape(64, 64)
  assert (h[cow] == 3).all()
  assert (h[zom] == 5).all()
  assert (h[skel] == 3).all()


def test_deterministic_and_seed_sensitive():
  gen = jax.jit(worldgen.generate_world, static_argnums=1)
  a = gen(jax.random.PRNGKey(7), CFG)
  b = gen(jax.random.PRNGKey(7), CFG)
  c = gen(jax.random.PRNGKey(8), CFG)
  assert (np.asarray(a.mat_map) == np.asarray(b.mat_map)).all()
  assert (np.asarray(a.mat_map) != np.asarray(c.mat_map)).any()


def test_vmapped_batch():
  keys = jax.random.split(jax.random.PRNGKey(0), 8)
  batch = jax.jit(jax.vmap(worldgen.generate_world, in_axes=(0, None)),
                  static_argnums=1)(keys, CFG)
  assert batch.mat_map.shape == (8, 64 * 64)
  # Batch element matches the unbatched run with the same key.  With
  # noise_mode='fast', worldgen is float32 threshold logic and XLA may
  # fuse/FMA the two programs differently, so a noise value sitting exactly
  # on a threshold can flip a cell (~1 in 30k; the *step kernel* by
  # contrast is integer-exact, see test_step.py::test_noop_determinism).
  # The default 'pallas' noise is batch-exact — see
  # test_pallas_noise_batched_equals_single below.
  single = jax.jit(worldgen.generate_world, static_argnums=1)(keys[3], CFG)
  mismatch = (np.asarray(batch.mat_map[3]) != np.asarray(single.mat_map)).mean()
  assert mismatch < 1e-3, mismatch
  # Different keys → different worlds.
  assert (np.asarray(batch.mat_map[0]) != np.asarray(batch.mat_map[1])).any()


def test_pallas_noise_batched_equals_single():
  """SURVEY §4(c) exactness: with the default TPU noise path (fixed-shape
  Pallas blocks — the same kernel binary regardless of batch), batched and
  single worldgen agree on 100% of cells."""
  cfg = EnvConfig(noise_mode='pallas')
  keys = jax.random.split(jax.random.PRNGKey(5), 8)
  batch = jax.jit(jax.vmap(worldgen.generate_world, in_axes=(0, None)),
                  static_argnums=1)(keys, cfg)
  single = jax.jit(worldgen.generate_world, static_argnums=1)
  for i in range(8):
    s = single(keys[i], cfg)
    np.testing.assert_array_equal(np.asarray(batch.mat_map[i]),
                                  np.asarray(s.mat_map))
    np.testing.assert_array_equal(np.asarray(batch.ent.etype[i]),
                                  np.asarray(s.ent.etype))


def test_average_spawn_counts():
  """Mob seeding rates across many worlds match the reference's binomials."""
  keys = jax.random.split(jax.random.PRNGKey(42), 24)
  batch = jax.jit(jax.vmap(worldgen.generate_world, in_axes=(0, None)),
                  static_argnums=1)(keys, CFG)
  et = np.asarray(batch.ent.etype)
  cows = (et == rules.E_COW).sum(-1).mean()
  zombies = (et == rules.E_ZOMBIE).sum(-1).mean()
  # ~grass_cells * 0.015 cows; grass is typically 1000-2500 of 4096 cells.
  assert 5 < cows < 60
  assert 1 < zombies < 40


def test_semantic_view(world):
  from crafter_tpu import state as state_lib
  sem = np.asarray(state_lib.semantic_view(world, CFG))
  # Player id = 13 (N_MATERIALS + 0) at center.
  assert sem[32, 32] == rules.N_MATERIALS
  # Entity cells carry entity ids, everything else material ids.
  et = np.asarray(world.ent.etype).reshape(64, 64)
  assert (sem[et > 0] == rules.N_MATERIALS + et[et > 0] - 1).all()
  assert (sem[et == 0] < rules.N_MATERIALS).all()


def test_pallas_noise_mode_matches_fast():
  """noise_mode='pallas' produces the same worlds as 'fast' (bit-level
  noise agreement; interpret mode on CPU)."""
  import dataclasses
  from crafter_tpu.config import EnvConfig
  fast = jax.jit(worldgen.generate_world, static_argnums=1)(
      jax.random.key(3), EnvConfig(noise_mode='fast'))
  pal = jax.jit(worldgen.generate_world, static_argnums=1)(
      jax.random.key(3), EnvConfig(noise_mode='pallas'))
  mism = (np.asarray(fast.mat_map) != np.asarray(pal.mat_map)).mean()
  assert mism < 1e-3, mism  # float-threshold residue only
