"""Point gather/scatter on per-env grids as one-hot MXU contractions.

STATUS: these primitives carried the round-1 entity-table engine; the
round-2 cellular-automaton kernel (step.py) needs none of them on the hot
path.  They remain the TPU-idiomatic replacement for any per-point
gather/scatter this framework grows next (tooling, custom wrappers) and
stay covered by tests/test_maps.py.

XLA lowers per-point gathers and scatters to serialized dynamic slices on
TPU: a single (4096 envs × 256 points) gather from the (64, 64) maps costs
~35 ms — the entire simulation tick budget many times over.  These
helpers express the same operations as one-hot matmuls, which the MXU eats
in well under a millisecond at the same shapes.

Exactness: grid values here are small integers (materials ≤ 12, entity
slots ≤ 256) and one-hot rows contain a single 1, so bfloat16 products and
float32 MXU accumulation reproduce the integer results exactly (integers
up to 2^8 are exact in bf16).  Every helper is validated bit-for-bit
against the `.at[...]`/indexing formulation in tests/test_maps.py.

All functions operate on ONE env (vmap them over the batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BF = jnp.bfloat16


def _onehots(pos: jax.Array, shape, active: jax.Array):
  """Row/col one-hots for points: (K, W), (K, H) bf16; inactive rows 0."""
  w, h = shape
  ohx = ((pos[..., 0, None] == jnp.arange(w)) & active[..., None])
  ohy = (pos[..., 1, None] == jnp.arange(h))
  return ohx.astype(_BF), ohy.astype(_BF)


def _inbounds(pos: jax.Array, shape) -> jax.Array:
  w, h = shape
  return ((pos[..., 0] >= 0) & (pos[..., 0] < w)
          & (pos[..., 1] >= 0) & (pos[..., 1] < h))


def map_gather(grid: jax.Array, pos: jax.Array, fill=0) -> jax.Array:
  """grid[pos[...,0], pos[...,1]] with `fill` outside bounds.

  grid (W, H) int; pos (..., 2).  Returns int32 of pos.shape[:-1].
  """
  shape = grid.shape
  lead = pos.shape[:-1]
  p = pos.reshape(-1, 2)
  active = _inbounds(p, shape)
  ohx, ohy = _onehots(p, shape, active)
  # A[k, i] = sum_j grid[i, j] * ohy[k, j]  -> (K, W)
  a = jnp.einsum('ij,kj->ki', grid.astype(_BF), ohy,
                 preferred_element_type=jnp.float32)
  out = (a * ohx.astype(jnp.float32)).sum(-1)
  out = out.astype(jnp.int32)
  return jnp.where(active, out, fill).reshape(lead)


def map_scatter(grid: jax.Array, pos: jax.Array, vals, active: jax.Array
                ) -> jax.Array:
  """Set vals at active in-bounds cells (cells must be distinct).

  grid (W, H); pos (K, 2); vals (K,) or scalar; active (K,) bool.
  Duplicate active cells are the caller's bug (values would sum).
  """
  shape = grid.shape
  active = active & _inbounds(pos, shape)
  ohx, ohy = _onehots(pos, shape, active)
  vals = jnp.broadcast_to(jnp.asarray(vals, jnp.int32), pos.shape[:1])
  mask = jnp.einsum('ki,kj->ij', ohx, ohy,
                    preferred_element_type=jnp.float32)
  scat = jnp.einsum('ki,kj->ij', ohx * vals.astype(_BF)[:, None], ohy,
                    preferred_element_type=jnp.float32)
  out = (grid.astype(jnp.float32) * (1.0 - mask) + scat)
  return out.astype(grid.dtype)


def table_gather(table: jax.Array, idx: jax.Array, fill=0,
                 precise: bool = False) -> jax.Array:
  """table[idx] for a 1-D int table (T,) with T small (<= a few hundred).

  idx any shape; out-of-range indices return `fill`.  Table values must be
  integers in [-256, 256] (exact in bf16); pass ``precise=True`` for wider
  ranges (float32 contraction, exact to 2^24 — e.g. plant growth
  counters).
  """
  t = table.shape[0]
  lead = idx.shape
  flat = idx.reshape(-1)
  active = (flat >= 0) & (flat < t)
  dt = jnp.float32 if precise else _BF
  oh = ((flat[:, None] == jnp.arange(t)) & active[:, None]).astype(dt)
  out = jnp.einsum('kt,t->k', oh, table.astype(dt),
                   preferred_element_type=jnp.float32)
  out = out.astype(jnp.int32)
  return jnp.where(active, out, fill).reshape(lead)


def table_scatter_set(table: jax.Array, idx: jax.Array, vals,
                      active: jax.Array) -> jax.Array:
  """Set vals at distinct active indices of a 1-D table (T,)."""
  t = table.shape[0]
  active = active & (idx >= 0) & (idx < t)
  oh = ((idx[:, None] == jnp.arange(t)) & active[:, None]).astype(_BF)
  vals = jnp.broadcast_to(jnp.asarray(vals, jnp.int32), idx.shape)
  mask = jnp.einsum('kt->t', oh, preferred_element_type=jnp.float32)
  scat = jnp.einsum('kt,k->t', oh, vals.astype(_BF),
                    preferred_element_type=jnp.float32)
  out = table.astype(jnp.float32) * (1.0 - mask) + scat
  return out.astype(table.dtype)


def table_scatter_add(size: int, idx: jax.Array, vals) -> jax.Array:
  """Segment-sum vals into a fresh (size,) int32 table (drop OOB)."""
  active = (idx >= 0) & (idx < size)
  oh = ((idx[:, None] == jnp.arange(size)) & active[:, None]).astype(_BF)
  vals = jnp.broadcast_to(jnp.asarray(vals, _BF), idx.shape)
  out = jnp.einsum('kt,k->t', oh, vals,
                   preferred_element_type=jnp.float32)
  return out.astype(jnp.int32)


def occupant(query_pos: jax.Array, ent_pos: jax.Array,
             alive: jax.Array) -> jax.Array:
  """Which entity occupies each queried cell: slot+1, or 0 if empty.

  query_pos (..., 2); ent_pos (K, 2); alive (K,).  Entities are unique per
  cell, so the lowest matching slot is the occupant.  Pairwise position
  compares on the VPU — the entity table IS the occupancy index, so no
  obj_map gather is needed in the hot path.
  """
  k = ent_pos.shape[0]
  lead = query_pos.shape[:-1]
  q = query_pos.reshape(-1, 2)
  match = ((q[:, None, 0] == ent_pos[None, :, 0])
           & (q[:, None, 1] == ent_pos[None, :, 1])
           & alive[None, :])
  slot = jnp.where(match, jnp.arange(k)[None, :], k).min(-1)
  return jnp.where(slot < k, slot + 1, 0).reshape(lead)


def claim_lowest(pos: jax.Array, valid: jax.Array) -> jax.Array:
  """Movement-claim resolution: does each claimant win its target cell?

  Claimant k wins iff valid and no valid j < k targets the same cell —
  the dense replacement for a scatter-min of slot ids (K^2 compares on the
  VPU instead of a serialized scatter).
  """
  k = pos.shape[0]
  same = (pos[:, None, 0] == pos[None, :, 0]) & \
         (pos[:, None, 1] == pos[None, :, 1])
  lower = jnp.arange(k)[None, :] < jnp.arange(k)[:, None]
  blocked = (same & lower & valid[None, :]).any(-1)
  return valid & ~blocked


def masked_argmax_per_segment(seg: jax.Array, score: jax.Array,
                              n_seg: int, member: jax.Array):
  """Per-segment argmax: for each segment, the member k with max score.

  seg (K,) int segment ids; score (K,) int32 >= 0; member (K,) bool.
  Returns (best_k (n_seg,) int32 [-1 if empty], best_score (n_seg,)).
  Dense (K, n_seg) formulation replacing a packed scatter-max.
  """
  k = seg.shape[0]
  oh = ((seg[:, None] == jnp.arange(n_seg)) & member[:, None])
  neg = jnp.int32(-1)
  scores = jnp.where(oh, score[:, None], neg)          # (K, n_seg)
  best_score = scores.max(0)
  is_best = (scores == best_score[None, :]) & oh
  best_k = jnp.where(is_best, jnp.arange(k)[:, None], k).min(0)
  return jnp.where(best_score >= 0, best_k, -1), best_score
