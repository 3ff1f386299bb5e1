"""On-device PPO actor-learner, colocated with the batched env.

The reference's training example hands a single Python env to SB3's PPO
(reference: examples/run_ppo.py:15-21, published score 4.6 ± 0.3 at 1M env
steps, README.md:138).  Here the entire loop — rollout, GAE, minibatch
SGD — is one jitted function over the device-resident env batch, so there
is no host↔device traffic in the hot path at all:

* rollout = ``lax.scan`` of (policy forward → env tick → render) over T;
* the env batch shards over the mesh's ``dp`` axis (`jax.sharding`); the
  loss is a global mean, so XLA inserts the cross-chip gradient
  all-reduce — no hand-written collectives;
* policy compute is bfloat16 on the MXU (models/cnn.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from . import rules
from .config import DEFAULT_CONFIG, EnvConfig
from .env import CrafterEnv, VecState, home_keys, vec_reset, vec_step
from .models import CnnPolicy


@dataclasses.dataclass(frozen=True)
class PPOConfig:
  """Hyperparameters mirroring SB3 PPO defaults (the parity anchor)."""

  num_envs: int = 64
  rollout_len: int = 64
  epochs: int = 3
  minibatches: int = 8
  gamma: float = 0.99
  gae_lambda: float = 0.95
  clip: float = 0.2
  vf_coef: float = 0.5
  ent_coef: float = 0.01
  lr: float = 3e-4
  max_grad_norm: float = 0.5
  reset_batch: int = 64
  seed: int = 0
  # Minibatch axis (see PPO._update).  None = auto: global flatten+shuffle
  # on a single device (fastest there — measured ~20% over time-axis),
  # time-axis when the env batch is sharded over a mesh (shard-local
  # gathers; the global shuffle forces GSPMD cross-shard gathers, ~10x
  # the SGD wall on 8 devices).  make_sharded_train resolves None by mesh
  # size; a bare PPO() resolves it to the single-device choice.
  time_minibatch: Optional[bool] = None
  # Global-mode shuffle cadence.  'update' (default): ONE whole-batch
  # gather per update; the minibatch PARTITION holds across the E epochs
  # (visit order still re-permutes per epoch).  This deviates from SB3's
  # per-epoch reshuffle, but uint8 frame gathers run ~4x over HBM
  # roofline on TPU (minor-dim-3 layout inflation, PERF.md), so per-epoch
  # gathers cost ~190 ms of a ~1.1 s update; quality re-validated at
  # parity (RESULTS.md).  'epoch': SB3-exact per-epoch reshuffle.
  shuffle_per: str = 'update'


@struct.dataclass
class PPOState:
  params: Any
  opt_state: Any
  vec: VecState
  obs: jax.Array          # (N, H, W, 3) uint8 current observations
  key: jax.Array
  update: jax.Array       # () int32
  env_steps: jax.Array    # () int64-ish counter (int32 is fine to 2B)
  # On-device episode accumulators (SURVEY §5): running length/return per
  # env, so stats cross update boundaries without host bookkeeping.
  ep_len: jax.Array       # (N,) int32
  ep_ret: jax.Array       # (N,) float32


@struct.dataclass
class Transition:
  obs: jax.Array
  action: jax.Array
  logp: jax.Array
  value: jax.Array
  reward: jax.Array       # training reward (zeroed in the NoReward variant)
  done: jax.Array         # latched: stays true while awaiting auto-reset
  ended: jax.Array        # pulses once on the tick an episode finishes
  raw_reward: jax.Array   # info['reward'] — what StatsRecorder accumulates
  achievements: jax.Array  # (N, 22) terminal-step counters for stats


class PPO:
  """Builds jitted `init` and `train_step` closures for a config."""

  def __init__(self, env_cfg: EnvConfig = DEFAULT_CONFIG,
               cfg: PPOConfig = PPOConfig()):
    self.env_cfg = env_cfg
    self.cfg = cfg
    self.core = CrafterEnv(env_cfg)
    self.model = CnnPolicy(n_actions=rules.N_ACTIONS)
    self.tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr, eps=1e-5))

  # -- initialization ------------------------------------------------------

  def init(self, key: jax.Array) -> PPOState:
    k_param, k_env, k_run = jax.random.split(key, 3)
    obs_shape = tuple(self.env_cfg.size) + (3,)
    params = self.model.init(k_param, jnp.zeros((1,) + obs_shape, jnp.uint8))
    vec = vec_reset(home_keys(self.cfg.seed, self.cfg.num_envs),
                    self.env_cfg)
    # Frames are stored as standard uint8 NHWC: every frame is consumed
    # ~1+epochs times by the CNN, so unpacking once at render beats the
    # packed-int32 transport (measured: packed obs cost ~11% end-to-end —
    # the NHWC construction then ran per consumption instead of once).
    obs = self.core.observe_batch(vec.env)
    n = self.cfg.num_envs
    return PPOState(
        params=params, opt_state=self.tx.init(params), vec=vec, obs=obs,
        key=k_run, update=jnp.int32(0), env_steps=jnp.int32(0),
        ep_len=jnp.zeros((n,), jnp.int32), ep_ret=jnp.zeros((n,)))

  # -- rollout -------------------------------------------------------------

  def _rollout(self, ts: PPOState) -> Tuple[PPOState, Transition, jax.Array]:
    cfg = self.cfg
    k = self.env_cfg.balance_every
    # When the rollout divides into whole balance-cadence groups, step the
    # env on the group cadence: balance as a static branch on each group's
    # last tick and ONE reset pass per K ticks (sized K * reset_batch) —
    # no per-tick lax.cond plane copies, 1/K the worldgen dispatches.
    # Same semantics as the fused bench/group path (env.py:vec_step_group
    # docstring); the policy still acts every tick on that tick's frame.
    grouped = cfg.rollout_len % k == 0 and cfg.rollout_len >= k

    def one_step(carry, i, balance=None, reset_every=1, rb=None):
      vec, obs, key = carry
      # Envs latched `pending` at tick start are finished episodes idling
      # for a reset slot (up to K-1 ticks on the group cadence): their
      # rewards this tick are post-terminal junk, so zero them for
      # training.  `done` stays latched true, so GAE already cuts the
      # bootstrap through these ticks; stats key on the one-shot `ended`.
      stale = vec.pending
      key, k_act = jax.random.split(key)
      out = self.model.apply(ts.params, obs)
      action = jax.random.categorical(k_act, out.logits)
      logp = jax.nn.log_softmax(out.logits)[
          jnp.arange(action.shape[0]), action]
      vec, env_out, stepped = vec_step(
          vec, action, self.env_cfg, rb or cfg.reset_batch,
          reset_every=reset_every, balance=balance)
      next_obs = self.core.observe_batch(vec.env)
      reward = (jnp.where(stale, 0.0, env_out.reward)
                if self.env_cfg.reward
                else jnp.zeros_like(env_out.reward))
      tr = Transition(obs=obs, action=action, logp=logp, value=out.value,
                      reward=reward, done=env_out.done,
                      ended=env_out.ended, raw_reward=env_out.reward,
                      achievements=stepped.player.achievements)
      return (vec, next_obs, key), tr

    if grouped:
      def one_group(carry, _):
        trs = []
        for i in range(k):
          carry, tr = one_step(carry, i, balance=(i == k - 1),
                               reset_every=k, rb=k * cfg.reset_batch)
          trs.append(tr)
        return carry, jax.tree.map(lambda *xs: jnp.stack(xs), *trs)
      (vec, obs, key), traj = jax.lax.scan(
          one_group, (ts.vec, ts.obs, ts.key), None,
          length=cfg.rollout_len // k)
      traj = jax.tree.map(
          lambda x: x.reshape((cfg.rollout_len,) + x.shape[2:]), traj)
    else:
      (vec, obs, key), traj = jax.lax.scan(
          lambda c, _: one_step(c, 0), (ts.vec, ts.obs, ts.key), None,
          length=cfg.rollout_len)
    last_value = self.model.apply(ts.params, obs).value
    ts = ts.replace(
        vec=vec, obs=obs, key=key,
        env_steps=ts.env_steps + cfg.rollout_len * cfg.num_envs)
    return ts, traj, last_value

  # -- GAE -----------------------------------------------------------------

  def _gae(self, traj: Transition, last_value: jax.Array):
    cfg = self.cfg

    def scan_fn(carry, tr):
      gae, next_value = carry
      nonterm = 1.0 - tr.done.astype(jnp.float32)
      delta = tr.reward + cfg.gamma * next_value * nonterm - tr.value
      gae = delta + cfg.gamma * cfg.gae_lambda * nonterm * gae
      return (gae, tr.value), gae

    _, adv = jax.lax.scan(scan_fn, (jnp.zeros_like(last_value), last_value),
                          traj, reverse=True)
    return adv, adv + traj.value

  # -- optimization --------------------------------------------------------

  def _loss(self, params, batch):
    cfg = self.cfg
    obs, action, logp_old, adv, ret = batch
    out = self.model.apply(params, obs)
    logp_all = jax.nn.log_softmax(out.logits)
    logp = logp_all[jnp.arange(action.shape[0]), action]
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    ratio = jnp.exp(logp - logp_old)
    pg = -jnp.minimum(
        ratio * adv,
        jnp.clip(ratio, 1 - cfg.clip, 1 + cfg.clip) * adv).mean()
    v_loss = 0.5 * jnp.square(out.value - ret).mean()
    entropy = -(jnp.exp(logp_all) * logp_all).sum(-1).mean()
    loss = pg + cfg.vf_coef * v_loss - cfg.ent_coef * entropy
    return loss, dict(pg_loss=pg, v_loss=v_loss, entropy=entropy)

  def _update(self, ts: PPOState):
    """One PPO update: rollout T steps, then E epochs of M minibatches.

    The minibatch axis is mesh-aware (``cfg.time_minibatch``):

    * **Global** (single device, the default): flatten (T, N) and shuffle
      all T*N samples — SB3's exact scheme, and ~20% faster end-to-end on
      one chip than time-axis gathers (measured round 4).
    * **Time-axis** (sharded meshes): a permutation of the T rollout
      rows, M groups of T/M rows, every env in each minibatch.  The env
      axis is the sharded one under data parallelism, so this keeps every
      gather shard-local and every reshape env-major — a global
      flatten+shuffle forces GSPMD to reshard the whole batch and lower
      cross-shard gathers per minibatch (measured ~10x the unsharded SGD
      wall on an 8-device mesh).  Each minibatch still mixes (T/M) x N
      samples; only the shuffling granularity changes.
    """
    cfg = self.cfg
    time_mb = bool(cfg.time_minibatch)  # None (auto) => single-device global
    if time_mb:
      assert cfg.rollout_len % cfg.minibatches == 0, (
          'rollout_len must divide into minibatches (time-axis '
          'minibatching)')
    else:
      assert (cfg.rollout_len * cfg.num_envs) % cfg.minibatches == 0, (
          'rollout size must divide into minibatches')
    ts, traj, last_value = self._rollout(ts)
    return self._learn(ts, traj, last_value)

  def _learn(self, ts: PPOState, traj: Transition, last_value: jax.Array):
    """GAE + E epochs of M minibatches on a collected rollout (split from
    :meth:`_update` so tools/ppo_budget.py can time the stages apart)."""
    cfg = self.cfg
    time_mb = bool(cfg.time_minibatch)
    adv, ret = self._gae(traj, last_value)
    obs_hw = traj.obs.shape[2:]
    if not time_mb:
      # Frames stay in their NHWC rows through the shuffle: carrying them
      # FLAT (B, H*W*3) makes the gather ~30% cheaper but moves a full
      # u8 relayout into every loss entry — the (mb, 12288) ->
      # (mb, 64, 64, 3) reshape costs ~134 ms/update, eating the gather
      # savings twice over (profiled; tools/bench_obs_shuffle.py has the
      # isolated numbers).
      batch_n = cfg.rollout_len * cfg.num_envs
      data = jax.tree.map(
          lambda x: x.reshape((batch_n,) + x.shape[2:]),
          (traj.obs, traj.action, traj.logp, adv, ret))
    else:
      data = (traj.obs, traj.action, traj.logp, adv, ret)

    def sgd_step(params, opt_state, mb):
      obs_mb = mb[0].reshape((-1,) + obs_hw)
      (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
          params, (obs_mb,) + mb[1:])
      updates, opt_state = self.tx.update(grads, opt_state, params)
      params = optax.apply_updates(params, updates)
      return params, opt_state, dict(loss=loss, **aux)

    mb_n = ((cfg.rollout_len if time_mb else batch_n) // cfg.minibatches)

    if not time_mb and cfg.shuffle_per == 'update':
      # ONE whole-batch gather; epochs sweep contiguous minibatch slices
      # of the shuffled copy in a per-epoch random visit order.  The
      # partition is fixed across this update's epochs (PPOConfig.
      # shuffle_per) — per-epoch reshuffles re-pay the ~4x-over-roofline
      # u8 frame gather twice more for ~190 ms/update.
      key, k_perm = jax.random.split(ts.key)
      shuf = jax.tree.map(
          lambda x: x[jax.random.permutation(k_perm, batch_n)], data)

      def epoch(carry, _):
        params, opt_state, key = carry
        key, k_ord = jax.random.split(key)
        order = jax.random.permutation(k_ord, cfg.minibatches)

        def minibatch(carry, j):
          params, opt_state = carry
          mb = jax.tree.map(
              lambda x: jax.lax.dynamic_slice_in_dim(x, j * mb_n, mb_n),
              shuf)
          params, opt_state, metrics = sgd_step(params, opt_state, mb)
          return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            minibatch, (params, opt_state), order)
        return (params, opt_state, key), metrics

      (params, opt_state, key), metrics = jax.lax.scan(
          epoch, (ts.params, ts.opt_state, key), None, length=cfg.epochs)
    else:
      perm_n = cfg.rollout_len if time_mb else batch_n
      if time_mb:
        # Time-axis mode gathers T/M time rows (axis 0 is unsharded —
        # shard-local) and flattens time-major: a free reshape on device
        # (an env-major swapaxes relayouts ~0.5 GB of uint8 frames per
        # minibatch).  Global mode gathers flat sample rows directly.
        gather = lambda x, idx: x[idx].reshape((-1,) + x.shape[2:])
      else:
        gather = lambda x, idx: x[idx]

      def epoch(carry, _):
        params, opt_state, key = carry
        key, k_perm = jax.random.split(key)
        perm = jax.random.permutation(k_perm, perm_n)

        def minibatch(carry, idx):
          params, opt_state = carry
          mb = jax.tree.map(lambda x: gather(x, idx), data)
          params, opt_state, metrics = sgd_step(params, opt_state, mb)
          return (params, opt_state), metrics

        idxs = perm.reshape(cfg.minibatches, perm_n // cfg.minibatches)
        (params, opt_state), metrics = jax.lax.scan(
            minibatch, (params, opt_state), idxs)
        return (params, opt_state, key), metrics

      (params, opt_state, key), metrics = jax.lax.scan(
          epoch, (ts.params, ts.opt_state, ts.key), None, length=cfg.epochs)
    metrics = jax.tree.map(lambda x: x.mean(), metrics)
    metrics['reward_per_step'] = traj.reward.mean()
    metrics['episodes_done'] = traj.ended.sum()
    ts = ts.replace(params=params, opt_state=opt_state, key=key,
                    update=ts.update + 1)
    ts, stats = self._episode_stats(ts, traj)
    return ts, metrics, stats

  def _episode_stats(self, ts: PPOState, traj: Transition):
    """Finished-episode records, accumulated and packed on device.

    Episode length/return accumulate in the state (SURVEY §5's plan);
    each update scatters the episodes that finished during the rollout
    into a fixed (K,) buffer — the host drains K * ~100 bytes once per
    update instead of looping over every (step, env) pair.
    """
    cfg = self.cfg

    def scan_fn(carry, tr):
      length, ret = carry
      length = length + 1
      ret = ret + tr.raw_reward
      record = (length, ret)
      # Reset on the *latched* done: an env waiting for an auto-reset slot
      # re-zeroes every tick, so its junk waiting steps never leak into
      # the next episode's length/return.
      length = jnp.where(tr.done, 0, length)
      ret = jnp.where(tr.done, 0.0, ret)
      return (length, ret), record

    (ep_len, ep_ret), (lens, rets) = jax.lax.scan(
        scan_fn, (ts.ep_len, ts.ep_ret), traj)
    # Record on `ended` (one pulse per episode) — NOT the latched `done`,
    # which would re-emit a waiting env's achievements every tick.
    ended = traj.ended.reshape(-1)
    # Buffer sized for the synchronized-length-cap worst burst (all N envs
    # finishing inside one rollout) plus steady-state churn.
    k = cfg.num_envs + cfg.num_envs * cfg.rollout_len // 16
    slot = jnp.where(ended, jnp.cumsum(ended) - 1, k)  # k = dropped
    pack = lambda x: jnp.zeros((k,) + x.shape[2:], x.dtype).at[slot].set(
        x.reshape((-1,) + x.shape[2:]), mode='drop')
    count = ended.sum()
    stats = dict(
        count=jnp.minimum(count, k), dropped=jnp.maximum(count - k, 0),
        lengths=pack(lens), returns=pack(rets),
        achievements=pack(traj.achievements))
    return ts.replace(ep_len=ep_len, ep_ret=ep_ret), stats

  def train_step(self, ts: PPOState):
    ts, metrics, _ = self._update(ts)
    return ts, metrics

  def train_step_with_stats(self, ts: PPOState):
    """Like train_step but also returns per-step (reward, done,
    achievements) batches for the VecStatsRecorder."""
    return self._update(ts)


def make_sharded_train(env_cfg: EnvConfig, cfg: PPOConfig, mesh):
  """jit (init, train_step) with the env batch sharded over mesh axis 'dp'.

  Parameters/optimizer state replicate; every (N, ...) leaf shards along
  its leading env axis.  XLA derives the gradient all-reduce from the
  global-mean loss — the TPU-native replacement for NCCL allreduce.

  Shardings are pinned explicitly on BOTH sides of the jit: with only
  donation, the first call's output shardings (chosen by GSPMD) need not
  match the input placement, so every subsequent call recompiles — ~18 s
  per update on the 8-device CPU mesh.  Pinning in/out to the same tree
  makes train_step compile exactly once.  Returns
  ``(ppo, init, train_step, shard_state)`` where ``init`` is the jitted
  sharded initializer (eager ``ppo.init`` dispatches the whole worldgen op
  by op — ~190 s on CPU for 256 envs; jitted it is one compile + one run).
  """
  from jax.sharding import NamedSharding, PartitionSpec as P
  if cfg.time_minibatch is None:
    # Auto: time-axis minibatches only when the batch is actually sharded
    # (shard-local gathers); global flatten+shuffle on one device.
    cfg = dataclasses.replace(cfg, time_minibatch=mesh.devices.size > 1)
  ppo = PPO(env_cfg, cfg)
  repl = NamedSharding(mesh, P())
  dp = NamedSharding(mesh, P('dp'))
  batched = lambda leaf: leaf.ndim >= 1 and leaf.shape[0] == cfg.num_envs
  abs_ts = jax.eval_shape(ppo.init, jax.random.key(0))
  ts_shards = jax.tree.map(lambda l: dp if batched(l) else repl, abs_ts)
  _, abs_metrics = jax.eval_shape(ppo.train_step, abs_ts)
  m_shards = jax.tree.map(lambda _: repl, abs_metrics)

  init = jax.jit(ppo.init, out_shardings=ts_shards)
  train_step = jax.jit(ppo.train_step, donate_argnums=(0,),
                       in_shardings=(ts_shards,),
                       out_shardings=(ts_shards, m_shards))

  def shard_state(ts: PPOState) -> PPOState:
    return jax.tree.map(jax.device_put, ts, ts_shards)

  return ppo, init, train_step, shard_state
