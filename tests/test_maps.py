"""Bit-exactness of the one-hot map/table primitives vs plain indexing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crafter_tpu.ops import maps

KEY = jax.random.PRNGKey(3)


def rand(shape, lo, hi, key=KEY):
  return jax.random.randint(key, shape, lo, hi)


class TestMapOps:
  def test_map_gather_matches_indexing(self):
    grid = rand((64, 64), 0, 257)
    pos = rand((256, 2), -3, 67)
    got = jax.jit(maps.map_gather)(grid, pos)
    inb = ((pos[:, 0] >= 0) & (pos[:, 0] < 64)
           & (pos[:, 1] >= 0) & (pos[:, 1] < 64))
    want = jnp.where(
        inb, grid[jnp.clip(pos[:, 0], 0, 63), jnp.clip(pos[:, 1], 0, 63)], 0)
    assert (np.asarray(got) == np.asarray(want)).all()

  def test_map_gather_shapes(self):
    grid = rand((64, 64), 0, 13)
    pos = rand((256, 4, 2), 0, 64)
    got = maps.map_gather(grid, pos)
    assert got.shape == (256, 4)
    assert (np.asarray(got) ==
            np.asarray(grid[pos[..., 0], pos[..., 1]])).all()

  def test_map_scatter_matches_at_set(self):
    grid = rand((64, 64), 0, 13).astype(jnp.uint8)
    # distinct cells
    cells = jax.random.permutation(KEY, 64 * 64)[:256]
    pos = jnp.stack([cells // 64, cells % 64], -1)
    vals = rand((256,), 0, 257)
    active = rand((256,), 0, 2) == 0
    got = jax.jit(maps.map_scatter)(grid, pos, vals, active)
    px = jnp.where(active, pos[:, 0], 64)
    want = grid.at[px, pos[:, 1]].set(vals.astype(jnp.uint8), mode='drop')
    assert (np.asarray(got) == np.asarray(want)).all()
    assert got.dtype == grid.dtype

  def test_map_scatter_oob_dropped(self):
    grid = jnp.zeros((64, 64), jnp.int32)
    pos = jnp.asarray([[70, 3], [-1, 5], [4, 4]])
    got = maps.map_scatter(grid, pos, 9, jnp.asarray([True, True, True]))
    assert int(got.sum()) == 9 and int(got[4, 4]) == 9

  def test_table_gather(self):
    table = rand((257,), 0, 257)
    idx = rand((256,), -5, 280)
    got = jax.jit(maps.table_gather)(table, idx)
    ok = (idx >= 0) & (idx < 257)
    want = jnp.where(ok, table[jnp.clip(idx, 0, 256)], 0)
    assert (np.asarray(got) == np.asarray(want)).all()

  def test_table_gather_value_256_exact(self):
    # slot+1 can be 256; must be exact through bf16.
    table = jnp.full((300,), 256, jnp.int32)
    got = maps.table_gather(table, jnp.arange(300))
    assert (np.asarray(got) == 256).all()

  def test_table_scatter_set(self):
    table = rand((256,), 0, 100)
    idx = jax.random.permutation(KEY, 256)[:64]
    vals = rand((64,), 0, 257)
    active = rand((64,), 0, 2) == 0
    got = jax.jit(maps.table_scatter_set)(table, idx, vals, active)
    want = table.at[jnp.where(active, idx, 256)].set(vals, mode='drop')
    assert (np.asarray(got) == np.asarray(want)).all()

  def test_table_scatter_add(self):
    idx = rand((256,), -2, 40)
    vals = rand((256,), 0, 5)
    got = jax.jit(lambda i, v: maps.table_scatter_add(36, i, v))(idx, vals)
    want = jnp.zeros((37,), jnp.int32).at[
        jnp.clip(idx, -1, 36)].add(vals, mode='drop')[:36]
    # clip sends -2 to -1 -> mode drop handles;  compare in-range only
    want = jnp.zeros((36,), jnp.int32).at[
        jnp.where((idx >= 0) & (idx < 36), idx, 36)].add(
            vals, mode='drop')
    assert (np.asarray(got) == np.asarray(want)).all()

  def test_claim_lowest_matches_scatter_min(self):
    pos = rand((256, 2), 0, 8)  # many collisions
    valid = rand((256,), 0, 3) > 0
    got = jax.jit(maps.claim_lowest)(pos, valid)
    claim = jnp.full((8, 8), 256).at[
        jnp.where(valid, pos[:, 0], 8), pos[:, 1]].min(
            jnp.arange(256), mode='drop')
    want = valid & (claim[pos[:, 0], pos[:, 1]] == jnp.arange(256))
    assert (np.asarray(got) == np.asarray(want)).all()

  def test_masked_argmax_per_segment(self):
    seg = rand((64,), 0, 10)
    score = rand((64,), 0, 1000)
    member = rand((64,), 0, 2) == 0
    best_k, best_s = jax.jit(
        lambda s, sc, m: maps.masked_argmax_per_segment(s, sc, 10, m))(
            seg, score, member)
    for g in range(10):
      mask = np.asarray(member) & (np.asarray(seg) == g)
      if not mask.any():
        assert int(best_k[g]) == -1
      else:
        ks = np.flatnonzero(mask)
        top = ks[np.argmax(np.asarray(score)[ks])]
        # ties: lowest k wins
        tops = ks[np.asarray(score)[ks] == np.asarray(score)[ks].max()]
        assert int(best_k[g]) == tops.min()
        assert int(best_s[g]) == np.asarray(score)[ks].max()

  def test_table_gather_precise_large_values(self):
    table = jnp.asarray([0, 301, 9999, 256, 257])
    got = maps.table_gather(table, jnp.arange(5), precise=True)
    assert got.tolist() == [0, 301, 9999, 256, 257]
