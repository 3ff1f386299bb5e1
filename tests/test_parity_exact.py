"""Bit-exact oracle: ParityEnv vs the live reference, same seed, same actions.

North-star config 1 (BASELINE.json): trajectory + achievement parity for a
fixed seed.  The parity engine consumes the reference's MT19937 stream in
the same order, so every step must agree on observation pixels, reward,
done, inventory, achievements, semantic map, and player position.

The single underdetermined reference behavior — despawn victims are indexed
from per-chunk ``set``s whose iteration order depends on CPython object ids
(crafter/engine.py:36, crafter/env.py:162,176) and is not reproducible even
between two reference runs — is pinned here by patching the reference's
chunk index to insertion-ordered sets (the parity engine's canonical
choice; see PARITY.md).
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import refshim

HAVE_REF = refshim.install()
pytestmark = pytest.mark.skipif(not HAVE_REF, reason='no reference checkout')


class _OrderedSet:
  """Insertion-ordered stand-in for the chunk-index sets."""

  def __init__(self):
    self._d = {}

  def add(self, obj):
    self._d[id(obj)] = obj

  def remove(self, obj):
    del self._d[id(obj)]

  def __iter__(self):
    return iter(list(self._d.values()))

  def __len__(self):
    return len(self._d)


@pytest.fixture()
def pinned_reference(monkeypatch):
  """The reference env class with insertion-ordered chunk sets."""
  import collections
  import crafter
  from crafter import engine
  original_reset = engine.World.reset

  def reset(self, seed=None):
    original_reset(self, seed)
    self._chunks = collections.defaultdict(_OrderedSet)

  monkeypatch.setattr(engine.World, 'reset', reset)
  return crafter.Env


def _rollout(env, seed, max_steps):
  """(per-step comparable records, episode length)."""
  rng = np.random.default_rng(seed)
  obs = env.reset()
  records = [dict(obs=np.asarray(obs))]
  for t in range(max_steps):
    obs, reward, done, info = env.step(int(rng.integers(0, 17)))
    records.append(dict(
        obs=np.asarray(obs), reward=float(reward), done=bool(done),
        inventory=dict(info['inventory']),
        achievements=dict(info['achievements']),
        semantic=np.asarray(info['semantic']),
        player_pos=tuple(np.asarray(info['player_pos']))))
    if done:
      break
  return records


def _assert_identical(ref, got, seed):
  assert len(ref) == len(got), (seed, len(ref), len(got))
  np.testing.assert_array_equal(ref[0]['obs'], got[0]['obs'],
                                err_msg=f'reset obs, seed {seed}')
  for t, (r, g) in enumerate(zip(ref[1:], got[1:]), 1):
    ctx = f'seed {seed} step {t}'
    assert g['player_pos'] == r['player_pos'], ctx
    assert g['inventory'] == r['inventory'], ctx
    assert g['achievements'] == r['achievements'], ctx
    np.testing.assert_array_equal(r['semantic'], g['semantic'], err_msg=ctx)
    assert g['reward'] == r['reward'], ctx
    assert g['done'] == r['done'], ctx
    np.testing.assert_array_equal(r['obs'], g['obs'], err_msg=ctx)


@pytest.mark.parametrize('seed', [0, 1, 7])
def test_full_episode_bit_exact(pinned_reference, seed):
  """A full random-policy episode agrees on every field, every step."""
  from crafter_tpu.parity import ParityEnv
  ref = _rollout(pinned_reference(seed=seed), seed, max_steps=2000)
  got = _rollout(ParityEnv(seed=seed), seed, max_steps=2000)
  _assert_identical(ref, got, seed)
  assert ref[-1]['done'], 'episode should terminate within the cap'


def test_second_episode_continues_the_stream(pinned_reference):
  """Episode 2 reseeds with hash((seed, 2)) — both engines must track it."""
  from crafter_tpu.parity import ParityEnv
  a, b = pinned_reference(seed=11), ParityEnv(seed=11)
  for env in (a, b):
    env.reset()
    for _ in range(5):
      env.step(0)
  ref = _rollout(a, 999, max_steps=120)   # triggers reset() -> episode 2
  got = _rollout(b, 999, max_steps=120)
  _assert_identical(ref, got, 'episode-2')


def test_oracle_detects_dynamics_mutation(pinned_reference):
  """A 50% zombie-damage buff must break parity (the suite has teeth).

  VERDICT r1 asked for evidence that a deliberate damage-constant mutation
  fails the tests; this runs a mutated parity engine over seeds that reach
  night-time zombie combat and requires a detected divergence.
  """
  from crafter_tpu import parity

  class Mutated(parity.ParityEnv):
    def _tick_zombie(self, ent):
      if ent.hp <= 0:
        self._remove(ent)
      dist = self._l1(ent.pos, self._player.pos)
      if dist <= 8 and self._rng.uniform() < 0.9:
        d = self._toward(ent.pos, self._player.pos,
                         self._rng.uniform() < 0.8)
        self._try_move(ent, d, self._walkable)
      else:
        self._try_move(ent, self._random_dir(), self._walkable)
      if self._l1(ent.pos, self._player.pos) <= 1:
        if ent.ctr:
          ent.ctr -= 1
        else:
          self._set_hp(self._player, self._inventory['health']
                       - (7 if self._sleeping else 3))  # mutated: 2 -> 3
          ent.ctr = 5

  parity._TICKS = dict(parity._TICKS, zombie=Mutated._tick_zombie)
  try:
    diverged = False
    for seed in (0, 1, 7, 13):
      ref = _rollout(pinned_reference(seed=seed), seed, max_steps=600)
      got = _rollout(Mutated(seed=seed), seed, max_steps=600)
      same = len(ref) == len(got) and all(
          r['inventory'] == g['inventory']
          and np.array_equal(r['semantic'], g['semantic'])
          for r, g in zip(ref[1:], got[1:]))
      if not same:
        diverged = True
        break
    assert diverged, 'mutated zombie damage went undetected'
  finally:
    parity._TICKS = dict(parity._TICKS,
                         zombie=parity.ParityEnv._tick_zombie)
