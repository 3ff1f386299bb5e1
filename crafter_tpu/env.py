"""Environment API: functional core, Gym-compatible wrapper, batched VecEnv.

Three surfaces over the same kernels:

* ``CrafterEnv`` — the pure functional core (gymnax-style):
  ``reset(key) -> (state, obs)`` and ``step(state, action) -> (state, obs,
  reward, done, info)``.  Everything jit/vmap/pjit-compatible.
* ``Env`` — drop-in replacement for the reference's Gym API
  (reference: crafter/env.py:25-179): ``reset() -> obs``,
  ``step(a) -> (obs, reward, done, info)``, ``render(size)``,
  ``observation_space``/``action_space``/``action_names``.
* ``VecEnv`` — N envs stepped in lockstep on device, with **partial-batch
  auto-reset**: world generation is the only expensive kernel (multi-octave
  noise over the 64×64 grid), so instead of re-generating all N worlds under
  a select every step (the standard JAX-RL trick, which would dominate the
  step cost), each step regenerates only a fixed-size sub-batch of the envs
  that finished.  Finished-env count per step is ~N/episode_len (Poisson),
  so ``reset_batch`` defaults comfortably above it; an env that cannot be
  reset this step (overflow) stays terminal and is picked next step.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import render as render_lib
from . import rules
from . import state as state_lib
from . import step as step_lib
from . import worldgen
from .config import DEFAULT_CONFIG, EnvConfig
from .state import EntMaps, Player, State

try:  # Mirror the reference's optional gym dependency (env.py:11-22).
  import gymnasium as _gym
  DiscreteSpace = _gym.spaces.Discrete
  BoxSpace = _gym.spaces.Box
  _GymBase = _gym.Env
except ImportError:  # pragma: no cover
  import collections
  _gym = None
  DiscreteSpace = collections.namedtuple('DiscreteSpace', 'n')
  BoxSpace = collections.namedtuple('BoxSpace', 'low, high, shape, dtype')
  _GymBase = object


class CrafterEnv:
  """Pure functional env core.  All methods are jittable pure functions."""

  def __init__(self, cfg: EnvConfig = DEFAULT_CONFIG):
    self.cfg = cfg
    self.atlas = render_lib.bake_atlas(cfg.size, cfg.view, cfg.item_rows)

  @property
  def num_actions(self) -> int:
    return rules.N_ACTIONS

  def reset(self, key: jax.Array) -> Tuple[State, jax.Array]:
    state = worldgen.generate_world(key, self.cfg)
    return state, self.observe(state)

  def step(self, state: State, action: jax.Array):
    state, out = step_lib.step(state, action, self.cfg)
    obs = self.observe(state)
    info = self.info(state, out)
    reward = out.reward if self.cfg.reward else jnp.float32(0.0)
    return state, obs, reward, out.done, info

  def observe(self, state: State) -> jax.Array:
    return render_lib.render(state, self.cfg, self.atlas, self.cfg.size)

  def observe_px(self, states: State) -> jax.Array:
    """Raw packed pixel lanes (N, C) int32 r|g<<8|b<<16 for a batch —
    the transport format of the training pipeline (ppo.py): skips the
    uint8 NHWC unpack in the hot loop (CnnPolicy consumes packed lanes
    directly).  Pallas kernel on TPU, vmapped jnp elsewhere
    (bit-identical — shared `_render_core` trace)."""
    engine = self.cfg.engine
    if engine == 'auto':
      engine = 'pallas' if jax.default_backend() == 'tpu' else 'jnp'
    if engine == 'jnp':
      return jax.vmap(lambda st: render_lib.render_px_fields(
          st.mat_map, st.ent.etype, st.ent.aux, st.ent.facing,
          st.player.pos, st.player.facing, st.player.sleeping,
          st.player.inventory, st.step, st.key, self.cfg,
          self.atlas))(states)
    packed = render_lib.pack_cells(states.mat_map, states.ent.etype,
                                   states.ent.aux, states.ent.facing)
    seeds = jax.vmap(render_lib._noise_seed)(states.key, states.step)
    return render_lib.render_frames(
        packed, states.player.pos, states.player.facing,
        states.player.sleeping.astype(jnp.int32), states.player.inventory,
        states.step, seeds, self.cfg, self.atlas, self.cfg.size,
        packed_out=True)

  def observe_batch(self, states: State) -> jax.Array:
    """Frames for a batch of envs: one Pallas render kernel on TPU,
    vmapped jnp elsewhere (bit-identical — shared `_render_core` trace)."""
    engine = self.cfg.engine
    if engine == 'auto':
      engine = 'pallas' if jax.default_backend() == 'tpu' else 'jnp'
    if engine == 'jnp':
      return jax.vmap(self.observe)(states)
    packed = render_lib.pack_cells(states.mat_map, states.ent.etype,
                                   states.ent.aux, states.ent.facing)
    seeds = jax.vmap(render_lib._noise_seed)(states.key, states.step)
    return render_lib.render_frames(
        packed, states.player.pos, states.player.facing,
        states.player.sleeping.astype(jnp.int32), states.player.inventory,
        states.step, seeds, self.cfg, self.atlas, self.cfg.size)

  def info(self, state: State, out: step_lib.StepOut) -> dict:
    """The reference's info dict, as arrays (env.py:108-115)."""
    return dict(
        inventory=state.player.inventory,
        achievements=state.player.achievements,
        discount=1.0 - out.dead.astype(jnp.float32),
        semantic=state_lib.semantic_view(state, self.cfg).astype(jnp.uint8),
        player_pos=state.player.pos,
        reward=out.reward,
        ended=out.ended)


class Env:
  """Gym-compatible single env mirroring the reference constructor
  (crafter/env.py:27-29): area/view/size/reward/length/seed."""

  def __init__(self, area=(64, 64), view=(9, 9), size=(64, 64),
               reward=True, length=10000, seed=None):
    view = tuple(view) if hasattr(view, '__len__') else (view, view)
    size = tuple(size) if hasattr(size, '__len__') else (size, size)
    seed = np.random.randint(0, 2 ** 31 - 1) if seed is None else seed
    self.cfg = EnvConfig(area=tuple(area), view=view, size=size,
                         reward=reward, length=length)
    self._core = CrafterEnv(self.cfg)
    self._seed = seed
    self._episode = 0
    self._state: Optional[State] = None
    self._reset_fn = jax.jit(self._core.reset)
    self._step_fn = jax.jit(self._core.step)
    # Some libraries expect these attributes (env.py:54-56).
    self.reward_range = None
    self.metadata = None

  @property
  def observation_space(self):
    return BoxSpace(0, 255, tuple(self.cfg.size) + (3,), np.uint8)

  @property
  def action_space(self):
    return DiscreteSpace(rules.N_ACTIONS)

  @property
  def action_names(self):
    return list(rules.ACTIONS)

  def reset(self):
    self._episode += 1
    key = jax.random.fold_in(jax.random.key(self._seed), self._episode)
    self._state, obs = self._reset_fn(key)
    return np.asarray(obs)

  def step(self, action):
    self._state, obs, reward, done, info = self._step_fn(
        self._state, jnp.int32(action))
    info = {
        'inventory': {name: int(info['inventory'][i])
                      for i, name in enumerate(rules.ITEMS)},
        'achievements': {name: int(info['achievements'][i])
                         for i, name in enumerate(rules.ACHIEVEMENTS)},
        'discount': float(info['discount']),
        'semantic': np.asarray(info['semantic']),
        'player_pos': np.asarray(info['player_pos']),
        'reward': float(info['reward']),
        # Our extension beyond the reference dict: pulses once on the tick
        # the episode ends.  Equal to `done` here (the caller resets); the
        # batched VecEnv latches `done` while awaiting an auto-reset slot,
        # so stats consumers key on `ended` uniformly across both APIs.
        'ended': bool(info['ended']),
    }
    return np.asarray(obs), float(reward), bool(done), info

  def render(self, size=None):
    size = tuple(size) if size is not None else self.cfg.size
    atlas = render_lib.bake_atlas(size, self.cfg.view, self.cfg.item_rows)
    return np.asarray(
        render_lib.render(self._state, self.cfg, atlas, size))


class GymnasiumEnv(_GymBase):
  """Gymnasium-API adapter (5-tuple step, seeded reset).

  The reference registers `CrafterReward-v1`/`CrafterNoReward-v1` against
  the old gym API (crafter/__init__.py:4-17); this adapter exposes the same
  environments through the modern gymnasium contract.
  """

  metadata = {'render_modes': ['rgb_array']}
  render_mode = 'rgb_array'

  def __init__(self, reward=True, length=10000, seed=None, **kwargs):
    self._env = Env(reward=reward, length=length, seed=seed, **kwargs)
    self.observation_space = self._env.observation_space
    self.action_space = self._env.action_space

  def reset(self, *, seed=None, options=None):
    if seed is not None:
      self._env._seed = seed
      self._env._episode = 0
    obs = self._env.reset()
    return obs, {}

  def step(self, action):
    obs, reward, done, info = self._env.step(action)
    terminated = bool(info['discount'] == 0.0)
    truncated = bool(done and not terminated)
    return obs, reward, terminated, truncated, info

  def render(self):
    return self._env.render()

  def close(self):
    pass


def register_gym_envs():
  """Register CrafterReward-v1 / CrafterNoReward-v1 (reference
  crafter/__init__.py:4-17) with gymnasium and, when importable, the old
  gym — the API the reference itself registers against (the 4-tuple
  ``Env`` satisfies old-gym's contract directly)."""
  try:
    import gymnasium
    for id_, reward in [('CrafterReward-v1', True),
                        ('CrafterNoReward-v1', False)]:
      if id_ not in gymnasium.registry:
        gymnasium.register(
            id=id_, entry_point='crafter_tpu.env:GymnasiumEnv',
            max_episode_steps=10000, kwargs={'reward': reward})
  except ImportError:  # pragma: no cover
    pass
  try:
    import gym
    registry = getattr(gym.envs, 'registry', None) or gym.envs.registry
    known = getattr(registry, 'env_specs', registry)
    for id_, reward in [('CrafterReward-v1', True),
                        ('CrafterNoReward-v1', False)]:
      if id_ not in known:
        gym.register(id=id_, entry_point='crafter_tpu.env:Env',
                     max_episode_steps=10000, kwargs={'reward': reward})
  except ImportError:
    pass


@struct.dataclass
class VecState:
  """Batched env state plus per-env reset bookkeeping."""

  env: State               # every leaf batched along axis 0
  episode: jax.Array       # (N,) int32 episodes started
  home_key: jax.Array      # (N,) per-env base PRNG key
  tick: jax.Array          # () int32 global step counter (balance cadence)
  pending: jax.Array       # (N,) bool — finished but not yet reset (latch:
  #                          a dead env stepped again can regen above 0 hp
  #                          and flip done back off; the latch keeps it
  #                          scheduled for reset regardless)


def vec_reset(home_key: jax.Array, cfg: EnvConfig):
  """Fresh batch of worlds from per-env home keys.  Pure/jittable.

  Worldgen evaluates ~53k noise points per env, so keep traced batches
  moderate (it is only on the hot path via ``vec_step``'s small partial
  resets); for thousands of envs use :func:`vec_reset_chunked`, which
  dispatches device-sized slices from the host.
  """
  n = home_key.shape[0]
  keys = jax.vmap(jax.random.fold_in)(home_key, jnp.ones((n,), jnp.uint32))
  env = jax.vmap(lambda k: worldgen.generate_world(k, cfg))(keys)
  return VecState(env=env, episode=jnp.ones((n,), jnp.int32),
                  home_key=home_key, tick=jnp.int32(0),
                  pending=jnp.zeros((n,), bool))


def vec_reset_chunked(home_key: jax.Array, cfg: EnvConfig,
                      chunk: int = 512) -> VecState:
  """Host-chunked initial reset for large batches.

  A single fused multi-thousand-env worldgen peaks at multi-GB
  intermediates on device; generating `chunk` envs per dispatch and
  concatenating bounds peak memory at chunk-size while only paying a few
  dispatches once per run (partial resets keep the steady state on
  device).
  """
  n = home_key.shape[0]
  if n <= chunk:
    return jax.jit(vec_reset, static_argnums=1)(home_key, cfg)
  reset = jax.jit(vec_reset, static_argnums=1)
  pieces = [reset(home_key[i:i + chunk], cfg) for i in range(0, n, chunk)]
  # Scalars (the global tick) are identical across pieces; batch leaves
  # concatenate.
  return jax.tree.map(
      lambda *xs: xs[0] if xs[0].ndim == 0 else jnp.concatenate(xs),
      *pieces)


def vec_step(vs: VecState, actions: jax.Array, cfg: EnvConfig,
             reset_batch: int, reset_every: int = 1,
             balance: Optional[bool] = None):
  """Batched tick + partial-batch auto-reset.  Pure/jittable.

  Returns ``(vs, out, stepped_env)``: envs that finished have been replaced
  in ``vs`` by fresh worlds (up to ``reset_batch`` per reset pass; overflow
  envs stay terminal and are picked up next pass), while ``stepped_env`` is
  the pre-reset batched state for terminal-step info.  Observations should
  be rendered by the caller from the post-reset ``vs.env``.

  ``reset_every``: run the reset pass only on every K-th tick (with
  ``reset_batch`` sized for K ticks of deaths).  Worldgen throughput is
  strongly sublinear in batch (~134 us/env at 32 envs vs ~50 us/env at
  512), so one big pass beats K small ones; a finished env idles latched
  for up to K-1 extra ticks, which the `pending` machinery already treats
  exactly like a reset_batch overflow.

  ``balance``: None runs chunk balancing on the global every-10th-tick
  cadence under a ``lax.cond``; True/False force the phase statically for
  this tick.  The cond costs real money beyond the skipped compute — XLA
  copies the five channel planes at the branch boundary (~0.3 ms/tick at
  4096 envs) — so cadence-aligned callers should statically unroll groups
  of ``cfg.balance_every`` ticks instead (:func:`vec_step_k`).
  """
  tick = vs.tick + 1
  if balance is None:
    # Global balance cadence under a real branch: 9 of 10 ticks skip the
    # chunk-balancing compute entirely (see step_lib.step's `balance` doc).
    env, out = jax.lax.cond(
        (tick % cfg.balance_every) == 0,
        lambda e, a: step_lib.step_batch(e, a, cfg, balance=True,
                                         engine=cfg.engine),
        lambda e, a: step_lib.step_batch(e, a, cfg, balance=False,
                                         engine=cfg.engine),
        vs.env, actions)
  else:
    env, out = step_lib.step_batch(vs.env, actions, cfg, balance=balance,
                                   engine=cfg.engine)
  stepped_env = env

  # Envs latched pending from an earlier overflow count as done whether or
  # not this tick's dynamics still agree (a dead env stepped again can
  # cross the regen threshold and report alive; it must reset regardless).
  # `ended` pulses only on the tick an episode genuinely finishes: a
  # pending env re-reporting done is the same episode still waiting, not a
  # new one (stats keyed on `done` would re-count its achievements every
  # tick of an overflow backlog).
  done = out.done | vs.pending
  out = out.replace(done=done, ended=out.done & ~vs.pending)

  reset_args = (env, done, vs.episode, vs.home_key)
  if reset_every > 1:
    env, episode, pending = jax.lax.cond(
        (tick % reset_every) == 0,
        lambda a: _reset_pass(*a, cfg, reset_batch),
        lambda a: (a[0], a[2], a[1]),   # skip: everyone stays pending
        reset_args)
  else:
    env, episode, pending = _reset_pass(*reset_args, cfg, reset_batch)
  vs = VecState(env=env, episode=episode, home_key=vs.home_key, tick=tick,
                pending=pending)
  return vs, out, stepped_env


def vec_step_k(vs: VecState, actions: jax.Array, cfg: EnvConfig,
               reset_batch: int):
  """``cfg.balance_every`` ticks with a statically unrolled balance cadence.

  ``actions`` is (K, N) with K == cfg.balance_every.  Chunk balancing runs
  on the group's last tick as a *static* branch, so no tick pays the
  ``lax.cond`` plane copies of :func:`vec_step`'s cadence branch (~0.3
  ms/tick at 4096 envs — the single largest non-kernel item in the tick
  profile).  The cadence phase is group-aligned rather than aligned to
  ``vs.tick % K``; like the global cadence itself, the phase relative to
  episode starts is already arbitrary under auto-reset, so this is
  distribution-neutral (PARITY.md).

  Returns ``(vs, outs)`` with every ``StepOut`` leaf stacked to (K, N).
  Callers that need the pre-reset terminal state per tick (``stepped_env``)
  should use :func:`vec_step`.
  """
  k = cfg.balance_every
  assert actions.shape[0] == k, (actions.shape, k)
  outs = []
  for i in range(k):
    vs, out, _ = vec_step(vs, actions[i], cfg, reset_batch,
                          balance=(i == k - 1))
    outs.append(out)
  return vs, jax.tree.map(lambda *xs: jnp.stack(xs), *outs)


def vec_step_group(vs: VecState, actions: jax.Array, cfg: EnvConfig,
                   reset_batch: int):
  """One whole balance-cadence group (K = cfg.balance_every ticks) as a
  single fused kernel, with balance and auto-reset at the group boundary.

  Bit-identical to K sequential calls of
  ``vec_step(..., reset_every=K, balance=(i == K-1))`` (asserted in
  tests/test_step.py::TestGroupKernel) — which is exactly what the jnp
  path below runs; the TPU path steps the group inside ONE ``pallas_call``
  (:func:`crafter_tpu.step.step_group_batch`), keeping the channel planes
  VMEM-resident across the K ticks instead of paying a per-tick HBM
  round-trip plus inter-launch XLA glue.

  Semantics note (PARITY.md): finished envs wait until the group boundary
  for their reset — the same latched-``pending`` machinery as a
  ``reset_batch`` overflow, just with a bounded K-1 tick wait.  Size
  ``reset_batch`` for K ticks of deaths (~K*N/170 under a random policy).

  ``actions``: (K, N).  Returns ``(vs, outs)`` with StepOut leaves (K, N).
  """
  k = cfg.balance_every
  assert actions.shape[0] == k, (actions.shape, k)
  engine = cfg.engine
  if engine == 'auto':
    engine = 'pallas' if jax.default_backend() == 'tpu' else 'jnp'
  if engine == 'jnp':
    outs = []
    for i in range(k):
      vs, out, _ = vec_step(vs, actions[i], cfg, reset_batch,
                            reset_every=k, balance=(i == k - 1))
      outs.append(out)
    return vs, jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

  env, raw, occ_pre = step_lib.step_group_batch(vs.env, actions, cfg)
  return _group_finish(vs, env, raw, occ_pre, cfg, reset_batch)


def _group_finish(vs: VecState, env: State, raw, occ_pre: jax.Array,
                  cfg: EnvConfig, reset_batch: int):
  """Latch dones, group-end balance, reset pass (shared by the group
  paths; see :func:`vec_step_group` for the semantics)."""
  k = cfg.balance_every
  # Latch dones across the group (the per-tick path's `pending` machinery,
  # folded): done_t = pending_0 | any(raw_done_{<=t}); `ended` pulses once.
  cum = jnp.cumsum(raw.done.astype(jnp.int32), axis=0) > 0
  done = vs.pending[None] | cum
  prev = jnp.concatenate([vs.pending[None], done[:-1]], axis=0)
  outs = raw.replace(done=done, ended=raw.done & ~prev)
  # Group-end balance (the last tick's balance phase, hoisted out of the
  # kernel; it reads chunk_touched as of tick K-1 via occ_pre) — one
  # batched Pallas kernel (step_lib._balance_pallas), bit-identical to
  # vmap(balance_group_finish) over the jnp phase.
  s_bal = jax.vmap(lambda key, s: step_lib._tick_seeds(key, s)[2])(
      env.key, env.step)
  env = step_lib._balance_pallas(env, s_bal, occ_pre, cfg)
  env, episode, pending = _reset_pass(env, done[-1], vs.episode,
                                      vs.home_key, cfg, reset_batch)
  vs = VecState(env=env, episode=episode, home_key=vs.home_key,
                tick=vs.tick + k, pending=pending)
  return vs, outs


def vec_step_group_obs(vs: VecState, actions: jax.Array, cfg: EnvConfig,
                       reset_batch: int, core: 'CrafterEnv'):
  """:func:`vec_step_group` plus one observation frame per tick — the
  fused pixel path (BASELINE config 3; the reference renders every step,
  crafter/env.py:96, :120-133).

  Frames 0..K-2 are rendered from per-tick snapshots the group kernel
  emits from VMEM (step.GroupSnaps) — one batched render over (K-1)*N
  frames instead of K-1 separate per-tick programs; frame K-1 is rendered
  from the post-balance, post-reset state, exactly like the per-tick
  VecEnv contract (finished envs show their next episode's first frame).

  Returns ``(vs, outs, obs)`` with ``obs`` (K, N, H, W, 3) uint8,
  ``obs[t]`` = the frame after tick t.  Bit-identical to K
  ``vec_step(..., reset_every=K, balance=(i == K-1))`` calls each
  followed by a batched render (asserted in tests/test_step.py).
  """
  k = cfg.balance_every
  assert actions.shape[0] == k, (actions.shape, k)
  engine = cfg.engine
  if engine == 'auto':
    engine = 'pallas' if jax.default_backend() == 'tpu' else 'jnp'
  if engine == 'jnp':
    outs, obs = [], []
    for i in range(k):
      vs, out, _ = vec_step(vs, actions[i], cfg, reset_batch,
                            reset_every=k, balance=(i == k - 1))
      outs.append(out)
      obs.append(jax.vmap(core.observe)(vs.env))
    return (vs, jax.tree.map(lambda *xs: jnp.stack(xs), *outs),
            jnp.stack(obs))

  n = actions.shape[1]
  key0, step0 = vs.env.key, vs.env.step  # episode keys: fixed over a group
  env, raw, occ_pre, snaps = step_lib.step_group_batch(
      vs.env, actions, cfg, snapshots=True)
  vs, outs = _group_finish(vs, env, raw, occ_pre, cfg, reset_batch)

  # ONE batched Pallas render over all K*N frames: ticks 0..K-2 from the
  # kernel's snapshots (tick-major, so the row flatten is free), tick K-1
  # from the post-balance post-reset state (reset envs show their next
  # episode's first frame: step/key are the fresh episode's, exactly like
  # a per-tick `observe` after the reset).
  c = cfg.area[0] * cfg.area[1]
  km1 = k - 1
  fin = vs.env
  # The kernel left snapshot row K-1 unwritten; drop the final frames'
  # packed plane into it in place (no concat copy of the big buffer).
  packed = snaps.packed.at[k - 1].set(
      render_lib.pack_cells(fin.mat_map, fin.ent.etype, fin.ent.aux,
                            fin.ent.facing)).reshape(k * n, c)
  ppos = jnp.concatenate([
      jnp.stack([snaps.px.reshape(-1), snaps.py.reshape(-1)], -1),
      fin.player.pos])
  pfac = jnp.concatenate([snaps.facing.reshape(-1), fin.player.facing])
  slp = jnp.concatenate([snaps.sleeping.reshape(-1),
                         fin.player.sleeping.astype(jnp.int32)])
  inv = jnp.concatenate([snaps.inv.reshape(km1 * n, rules.N_ITEMS),
                         fin.player.inventory])
  steps = jnp.concatenate([
      (step0[None, :] + 1 + jnp.arange(km1)[:, None]).reshape(-1),
      fin.step])
  seeds = jnp.concatenate([
      jax.vmap(render_lib._noise_seed)(
          jnp.broadcast_to(key0[None], (km1, n)).reshape(-1),
          (step0[None, :] + 1 + jnp.arange(km1)[:, None]).reshape(-1)),
      jax.vmap(render_lib._noise_seed)(fin.key, fin.step)])
  # Rows are already (tick 0..K-2) x N followed by the N final frames —
  # exactly (K, N) order — so the batch split is a free int32 reshape and
  # the uint8 unpack lands directly in the output shape (one copy).
  # NOT 'words': the in-kernel byte compaction measured 748k -> 599k
  # end-to-end — the 12-stage roll ladder costs ~13 ms/group, more than
  # double the ~5.8 ms unpack it replaces (PERF.md dead-end ledger).
  px = render_lib.render_frames(packed, ppos, pfac, slp, inv, steps,
                                seeds, cfg, core.atlas, cfg.size,
                                packed_out=True)
  obs = render_lib._frame_image(px.reshape(k, n, c), cfg.size)
  return vs, outs, obs


def _reset_pass(env: State, done: jax.Array, episode: jax.Array,
                home_key: jax.Array, cfg: EnvConfig, reset_batch: int):
  """Replace up to ``reset_batch`` finished envs with fresh worlds."""
  r = reset_batch
  n = done.shape[0]
  # The first r finished envs reset this pass (overflow waits for the next).
  # `rank` doubles as the permutation: row k of `p_rows` marks the env with
  # rank k (a single compare — the previous top_k was a device-wide sort).
  rank = jnp.cumsum(done) - 1
  selected = done & (rank < r)
  p_rows = (rank[None, :] == jnp.arange(r)[:, None]) & selected[None]
  keep = ~selected
  ep_next = episode + 1

  # Gather the selected envs' home keys / episode counters with the same
  # one-hot matmul (exact: 16-bit halves in float32).  Rows with no
  # selected env read zeros and generate a throwaway world, exactly like
  # the old top_k padding rows.
  def rows_gather16(vals32):
    """(n, d) int32 of 16-bit halves -> (r, d), exact via f32 matmul."""
    return (p_rows.astype(jnp.float32) @ vals32.astype(jnp.float32)
            ).astype(jnp.int32)

  hk = jax.random.key_data(home_key).astype(jnp.uint32)       # (n, 2)
  hk16 = jnp.concatenate([(hk & 0xFFFF).astype(jnp.int32),
                          (hk >> 16).astype(jnp.int32)], -1)  # (n, 4)
  g = rows_gather16(jnp.concatenate(
      [hk16, ep_next[:, None].astype(jnp.int32)], -1))        # (r, 5)
  gk = (g[:, :2] | (g[:, 2:4] << 16)).astype(jnp.uint32)
  gen_keys = jax.vmap(jax.random.fold_in)(
      jax.random.wrap_key_data(gk), g[:, 4].astype(jnp.uint32))
  fresh = jax.vmap(lambda k: worldgen.generate_world(k, cfg))(gen_keys)

  # Merge the r fresh worlds back with one-hot row matmuls: dynamic-index
  # row gathers/scatters serialize on TPU (~16 ms per reset), a (N, r)
  # contraction is a real MXU matmul.  Array leaves merge via the matmul;
  # per-env scalar leaves have closed-form fresh values (constants or
  # fold_in chains), computed for all N envs and selected elementwise.

  def rows_merge(old, new, precise=False):
    dt = jnp.float32 if precise else jnp.bfloat16
    scat = (p_rows.astype(dt).T @ new.reshape(r, -1).astype(dt)
            ).reshape(old.shape).astype(jnp.float32)
    keepb = keep.reshape((n,) + (1,) * (old.ndim - 1))
    return jnp.where(keepb, old, scat.astype(old.dtype))

  tables = rules.TABLES
  init_inv = jnp.asarray(tables.item_initial, jnp.int32)
  init_hp = jnp.int32(tables.item_initial[rules.ITEM_HEALTH])
  sel = lambda const, old: jnp.where(
      selected.reshape((n,) + (1,) * (old.ndim - 1)), const, old)
  # Episode keys for reset envs are exactly what worldgen stored
  # (fresh.key) — scatter them like every other array leaf.  Splitting the
  # uint32 words into 16-bit halves keeps the float32 one-hot matmul exact.
  # (The previous closed-form fold_in chain re-ran two serialized threefry
  # passes over all N envs every tick: ~1.3 ms at 4096 envs.)
  halves = lambda kd: jnp.stack(
      [kd.astype(jnp.int32) & 0xFFFF,
       (kd >> 16).astype(jnp.int32)], -1)
  kd_merged = rows_merge(halves(jax.random.key_data(env.key)),
                         halves(jax.random.key_data(fresh.key)),
                         precise=True)
  kd_merged = (kd_merged[..., 0] | (kd_merged[..., 1] << 16)
               ).astype(jnp.uint32)
  env = State(
      mat_map=rows_merge(env.mat_map, fresh.mat_map),
      ent=EntMaps(
          etype=rows_merge(env.ent.etype, fresh.ent.etype),
          health=rows_merge(env.ent.health, fresh.ent.health),
          aux=sel(0, env.ent.aux),
          facing=sel(0, env.ent.facing)),
      player=Player(
          pos=sel(jnp.asarray(cfg.center, jnp.int32)[None], env.player.pos),
          facing=sel(rules.DIR_DOWN, env.player.facing),
          inventory=sel(init_inv[None], env.player.inventory),
          achievements=sel(0, env.player.achievements),
          sleeping=sel(False, env.player.sleeping),
          hunger=sel(0, env.player.hunger),
          thirst=sel(0, env.player.thirst),
          fatigue=sel(0, env.player.fatigue),
          recover=sel(0, env.player.recover),
          last_health=sel(init_hp, env.player.last_health)),
      step=sel(0, env.step),
      key=jax.random.wrap_key_data(kd_merged),
      unlocked=sel(False, env.unlocked),
      env_last_health=sel(init_hp, env.env_last_health),
      chunk_touched=rows_merge(env.chunk_touched, fresh.chunk_touched))

  episode = jnp.where(selected, ep_next, episode)
  return env, episode, done & ~selected


def home_keys(seed: int, num_envs: int) -> jax.Array:
  return jax.vmap(lambda i: jax.random.fold_in(
      jax.random.key(seed), i))(jnp.arange(num_envs))


class VecEnv:
  """N lockstep envs on device with partial-batch auto-reset.

  ``step(actions)`` returns the *post-autoreset* observation, so finished
  envs hand back the first frame of their next episode (the standard
  batched-RL contract); the terminal step's reward/done/info describe the
  episode that just ended.
  """

  def __init__(self, num_envs: int, cfg: EnvConfig = DEFAULT_CONFIG,
               seed: int = 0, reset_batch: Optional[int] = None,
               sharding=None):
    self.num_envs = num_envs
    self.cfg = cfg
    self.core = CrafterEnv(cfg)
    self.reset_batch = min(num_envs, reset_batch or max(32, num_envs // 128))
    self._sharding = sharding
    self._home = home_keys(seed, num_envs)
    self._observe = jax.jit(self.core.observe_batch)
    self._step = jax.jit(self._step_impl, donate_argnums=(0,))
    self.state: Optional[VecState] = None
    # RL-library conveniences (mirror the single-env spaces).
    self.single_observation_space = BoxSpace(
        0, 255, tuple(cfg.size) + (3,), np.uint8)
    self.single_action_space = DiscreteSpace(rules.N_ACTIONS)
    self.observation_space = self.single_observation_space
    self.action_space = self.single_action_space
    self.action_names = list(rules.ACTIONS)

  def _reset_all(self, home):
    vs = vec_reset_chunked(home, self.cfg)
    return vs, self._observe(vs.env)

  def _step_impl(self, vs: VecState, actions: jax.Array):
    # info reflects the terminal step (pre-reset state); obs the post-reset
    # state (the next episode's first frame), the batched-RL contract.
    vs, out, stepped = vec_step(vs, actions, self.cfg, self.reset_batch)
    info = jax.vmap(self.core.info)(stepped, out)
    obs = self.core.observe_batch(vs.env)
    reward = out.reward if self.cfg.reward else jnp.zeros_like(out.reward)
    return vs, obs, reward, out.done, info

  def reset(self):
    self.state, obs = self._reset_all(self._home)
    if self._sharding is not None:
      self.state = jax.device_put(self.state, self._sharding_tree())
    return obs

  def step(self, actions):
    actions = jnp.asarray(actions, jnp.int32)
    self.state, obs, reward, done, info = self._step(self.state, actions)
    return obs, reward, done, info

  def _sharding_tree(self):
    return jax.tree.map(lambda _: self._sharding, self.state)
