"""Aggregate a training logdir into score JSONs and print Crafter scores.

Usage: python tools/score_run.py <logdir> <task> <method> [budget]
Writes scores/<task>-<method>.json (same format as the reference's
analysis/read_metrics.py) and prints the score table.
"""

import pathlib as _pathlib
import sys as _sys

# Runnable as a plain script: put the repo root on sys.path so
# crafter_tpu imports without an installed package.
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import sys

from crafter_tpu import analysis


def main():
  logdir = sys.argv[1]
  task = sys.argv[2] if len(sys.argv) > 2 else 'crafter_reward'
  method = sys.argv[3] if len(sys.argv) > 3 else 'ppo'
  budget = int(float(sys.argv[4])) if len(sys.argv) > 4 else int(1e6)
  out = analysis.read_stats(logdir, 'scores', task, method, budget)
  if out is None:
    print('No complete runs found in', logdir)
    return
  mean, std = analysis.crafter_score([out], budget)
  print(f'{method}: crafter score {float(mean[0]):.2f} '
        f'± {float(std[0]):.2f} % ({out})')
  analysis.print_summary(analysis.load_runs([out], budget), budget,
                         verbose=True)


if __name__ == '__main__':
  main()
