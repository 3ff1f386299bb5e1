"""Offline evaluation: success rates, Crafter score, stats aggregation.

Reimplements the reference's metric pipeline so runs recorded by either
engine score identically (reference: analysis/common.py:8-75,
analysis/read_metrics.py:10-64).  The golden tests reproduce the published
numbers from the reference's bundled score JSONs (random 1.6 ± 0.0, human
50.5 ± 6.8; README.md:147,153).
"""

from __future__ import annotations

import collections
import json
import pathlib
import warnings

import numpy as np


def load_runs(filenames, budget=1e6, verbose=False):
  """Load score-JSON runs; warn on short runs (common.py:8-20)."""
  runs = []
  for filename in filenames:
    loaded = json.loads(pathlib.Path(filename).read_text())
    for run in [loaded] if isinstance(loaded, dict) else loaded:
      if verbose and run['xs'][-1] < budget - 1e4:
        print(f'Run contains only {run["xs"][-1]} steps')
      runs.append(run)
  return runs


def compute_success_rates(runs, budget=1e6, sortby=None):
  """% of episodes (within budget) with each achievement unlocked
  (common.py:23-44): returns (methods, seeds, tasks) percent array."""
  methods = sorted(set(run['method'] for run in runs))
  seeds = sorted(set(run['seed'] for run in runs))
  tasks = sorted(key for key in runs[0] if key.startswith('achievement_'))
  percents = np.full((len(methods), len(seeds), len(tasks)), np.nan)
  for run in runs:
    episodes = (np.array(run['xs']) <= budget).sum()
    i = methods.index(run['method'])
    j = seeds.index(run['seed'])
    for key, values in run.items():
      if key in tasks:
        k = tasks.index(key)
        percents[i, j, k] = 100 * (np.array(values[:episodes]) >= 1).mean()
  if isinstance(sortby, (str, int)):
    if isinstance(sortby, str):
      sortby = methods.index(sortby)
    order = np.argsort(-np.nanmean(percents[sortby], 0), -1)
    percents = percents[:, :, order]
    tasks = np.array(tasks)[order].tolist()
  return percents, methods, seeds, tasks


def compute_scores(percents):
  """Crafter score: S = exp(mean(log(1 + p))) - 1 over the 22 tasks —
  geometric mean with a +1% offset (common.py:47-55)."""
  assert (0 <= percents).all() and (percents <= 100).all()
  with warnings.catch_warnings():
    warnings.simplefilter('ignore', category=RuntimeWarning)
    return np.exp(np.nanmean(np.log(1 + percents), -1)) - 1


def binning(xs, ys, borders, reducer=np.nanmean, fill='nan'):
  """Reduce (xs, ys) into buckets for training curves (common.py:58-75)."""
  xs, ys = np.array(xs), np.array(ys)
  order = np.argsort(xs)
  xs, ys = xs[order], ys[order]
  binned = []
  with warnings.catch_warnings():
    warnings.simplefilter('ignore', category=RuntimeWarning)
    for start, stop in zip(borders[:-1], borders[1:]):
      left = (xs <= start).sum()
      right = (xs <= stop).sum()
      if left < right:
        value = reducer(ys[left:right])
      elif binned:
        value = {'nan': np.nan, 'last': binned[-1]}[fill]
      else:
        value = np.nan
      binned.append(value)
  return borders[1:], np.array(binned)


def load_stats(filename, budget=int(1e6)):
  """One stats.jsonl -> (rewards, lengths, achievements), truncated at the
  budget, with reward recomputed as `unlocks - 0.9`
  (read_metrics.py:45-64)."""
  steps = 0
  rewards, lengths = [], []
  achievements = collections.defaultdict(list)
  for line in pathlib.Path(filename).read_text().split('\n'):
    if not line.strip():
      continue
    episode = json.loads(line)
    steps += episode['length']
    if steps > budget:
      break
    lengths.append(episode['length'])
    for key, value in episode.items():
      if key.startswith('achievement_'):
        achievements[key].append(value)
    unlocks = int(np.sum([(v[-1] >= 1) for v in achievements.values()]))
    rewards.append(unlocks - 0.9)
  return rewards, lengths, achievements


def read_stats(indir, outdir, task, method, budget=int(1e6)):
  """Aggregate logdir/**/stats.jsonl into scores/{task}-{method}.json
  (read_metrics.py:10-42); incomplete runs are skipped."""
  indir, outdir = pathlib.Path(indir), pathlib.Path(outdir)
  runs = []
  for index, filename in enumerate(sorted(indir.glob('**/stats.jsonl'))):
    rewards, lengths, achievements = load_stats(filename, budget)
    if sum(lengths) < budget - 1e4:
      print(f'Skipping incomplete run ({sum(lengths)} steps): {filename}')
      continue
    runs.append(dict(
        task=task, method=method, seed=str(index),
        xs=np.cumsum(lengths).tolist(), reward=rewards, length=lengths,
        **achievements))
  if not runs:
    return None
  outdir.mkdir(exist_ok=True, parents=True)
  out = outdir / f'{task}-{method}.json'
  out.write_text(json.dumps(runs))
  return out


def crafter_score(filenames, budget=1e6):
  """Convenience: mean ± std Crafter score across seeds for score JSONs."""
  runs = load_runs(filenames, budget)
  percents, methods, seeds, tasks = compute_success_rates(runs, budget)
  scores = compute_scores(percents)
  return np.nanmean(scores, -1), np.nanstd(scores, -1)
