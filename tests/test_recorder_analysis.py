"""Recorder formats + metric pipeline golden tests."""

import json
import pathlib

import numpy as np
import pytest

from crafter_tpu import analysis, rules
from crafter_tpu.recorder import StatsRecorder, VecStatsRecorder

REF_SCORES = pathlib.Path('/root/reference/scores')


class FakeEnv:
  """Deterministic env double: episodes of 3 steps, one unlock."""

  def __init__(self):
    self.t = 0

  def reset(self):
    self.t = 0
    return np.zeros((64, 64, 3), np.uint8)

  def step(self, action):
    self.t += 1
    done = self.t >= 3
    ach = {name: 0 for name in rules.ACHIEVEMENTS}
    if self.t >= 2:
      ach['collect_wood'] = 1
    info = {'reward': 1.0 if self.t == 2 else 0.0, 'achievements': ach,
            'inventory': {n: 0 for n in rules.ITEMS}, 'discount': 1.0,
            'semantic': np.zeros((64, 64), np.uint8),
            'player_pos': np.array([32, 32])}
    return np.zeros((64, 64, 3), np.uint8), info['reward'], done, info


class TestStatsRecorder:
  def test_stats_jsonl_format(self, tmp_path):
    # recorder.py:53-66 format: length, reward, achievement_*.
    env = StatsRecorder(FakeEnv(), tmp_path)
    for _ in range(2):
      env.reset()
      done = False
      while not done:
        _, _, done, _ = env.step(0)
    lines = (tmp_path / 'stats.jsonl').read_text().strip().split('\n')
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec['length'] == 3
    assert rec['reward'] == 1.0
    assert rec['achievement_collect_wood'] == 1
    assert rec['achievement_defeat_zombie'] == 0
    assert len([k for k in rec if k.startswith('achievement_')]) == 22


class TestVecStatsRecorder:
  def test_batched_lines_match_single(self, tmp_path):
    rec = VecStatsRecorder(3, tmp_path)
    ach = np.zeros((3, 22), np.int64)
    ach[1, rules.ACH_ID['collect_wood']] = 2
    rec.add(np.asarray([0.0, 1.0, 0.0]), np.asarray([False, False, False]),
            ach)
    rec.add(np.asarray([0.0, 0.5, 0.0]), np.asarray([False, True, False]),
            ach)
    lines = (tmp_path / 'stats.jsonl').read_text().strip().split('\n')
    assert len(lines) == 1
    data = json.loads(lines[0])
    assert data == {'length': 2, 'reward': 1.5,
                    **{f'achievement_{n}': (2 if n == 'collect_wood' else 0)
                       for n in rules.ACHIEVEMENTS}}

  def test_counters_reset_after_done(self, tmp_path):
    rec = VecStatsRecorder(1, tmp_path)
    ach = np.zeros((1, 22), np.int64)
    rec.add(np.asarray([2.0]), np.asarray([True]), ach)
    rec.add(np.asarray([3.0]), np.asarray([True]), ach)
    lines = (tmp_path / 'stats.jsonl').read_text().strip().split('\n')
    assert json.loads(lines[0])['reward'] == 2.0
    assert json.loads(lines[1])['reward'] == 3.0
    assert json.loads(lines[1])['length'] == 1


class TestScorePipeline:
  @pytest.mark.skipif(not REF_SCORES.exists(), reason='no reference scores')
  def test_reproduces_published_random_score(self):
    # README.md:147: random policy scores 1.6 ± 0.0.
    mean, std = analysis.crafter_score(
        [REF_SCORES / 'crafter_noreward-random.json'])
    assert round(float(mean[0]), 1) == 1.6

  @pytest.mark.skipif(not REF_SCORES.exists(), reason='no reference scores')
  def test_reproduces_published_human_score(self):
    # README.md:153: human experts score 50.5 ± 6.8.
    mean, std = analysis.crafter_score(
        [REF_SCORES / 'crafter_reward-human.json'], budget=1e6)
    assert round(float(mean[0]), 1) == 50.5
    assert round(float(std[0]), 1) == 6.8

  @pytest.mark.skipif(not REF_SCORES.exists(), reason='no reference scores')
  def test_print_summary(self, capsys):
    # read_metrics.py:68-81: per-run score/reward/length/episode means.
    runs = analysis.load_runs([REF_SCORES / 'crafter_noreward-random.json'])
    analysis.print_summary(runs, int(1e6), verbose=True)
    out = capsys.readouterr().out
    assert 'Score:' in out and 'Reward:' in out
    assert 'Length:' in out and 'Episodes:' in out
    assert 'Wake Up' in out  # verbose spectrum line

  def test_read_stats_roundtrip(self, tmp_path):
    # Write a synthetic 1M-step run of 3-step episodes, aggregate, score.
    logdir = tmp_path / 'run0'
    logdir.mkdir()
    n_eps = 334
    line = {'length': 3000, 'reward': 1.1,
            **{f'achievement_{n}': 0 for n in rules.ACHIEVEMENTS}}
    line['achievement_collect_wood'] = 1
    with (logdir / 'stats.jsonl').open('w') as f:
      for _ in range(n_eps):
        f.write(json.dumps(line) + '\n')
    out = analysis.read_stats(tmp_path, tmp_path / 'scores', 'crafter_reward',
                              'test')
    runs = analysis.load_runs([out])
    percents, _, _, tasks = analysis.compute_success_rates(runs)
    scores = analysis.compute_scores(percents)
    # collect_wood at 100%, 21 tasks at 0% -> exp(log(101)/22)-1.
    expected = np.exp(np.log(101) / 22) - 1
    assert abs(float(scores[0, 0]) - expected) < 1e-6
    # read_metrics.py:61-63 reward recompute: 1 unlock - 0.9.
    assert runs[0]['reward'][0] == pytest.approx(0.1)

  def test_binning(self):
    xs = [1, 2, 3, 10, 11]
    ys = [1.0, 2.0, 3.0, 10.0, 11.0]
    borders, binned = analysis.binning(xs, ys, np.array([0, 5, 20]))
    assert binned[0] == pytest.approx(2.0)
    assert binned[1] == pytest.approx(10.5)


class TestPlots:
  @pytest.mark.skipif(not REF_SCORES.exists(), reason='no reference scores')
  def test_print_scores_table(self):
    from crafter_tpu import plots
    out = plots.print_scores(
        [REF_SCORES / 'crafter_noreward-random.json',
         REF_SCORES / 'crafter_reward-human.json'])
    assert '1.6' in out and '50.5' in out

  @pytest.mark.skipif(not REF_SCORES.exists(), reason='no reference scores')
  def test_plot_scores_writes_png(self, tmp_path):
    import matplotlib
    matplotlib.use('Agg')
    from crafter_tpu import plots
    out = plots.plot_scores(
        [REF_SCORES / 'crafter_reward-human.json'], tmp_path / 's.png')
    assert (tmp_path / 's.png').exists()


class TestEpisodeRecorder:
  def test_npz_contents(self, tmp_path):
    from crafter_tpu.recorder import EpisodeRecorder
    env = EpisodeRecorder(FakeEnv(), tmp_path)
    env.reset()
    done = False
    while not done:
      _, _, done, _ = env.step(2)
    files = list(tmp_path.glob('*.npz'))
    assert len(files) == 1
    # Name schema {ts}-ach{N}-len{L} (recorder.py:183-185).
    assert '-ach1-len3' in files[0].name
    ep = np.load(files[0])
    assert ep['image'].shape == (4, 64, 64, 3)  # reset frame + 3 steps
    assert ep['action'].tolist() == [0, 2, 2, 2]  # zero-filled first step
    assert ep['done'].tolist() == [False, False, False, True]
    assert ep['achievement_collect_wood'].tolist() == [0, 0, 1, 1]
    assert ep['ainventory_wood'].shape == (4,)
    assert ep['reward'].tolist() == [0.0, 0.0, 1.0, 0.0]

  def test_video_recorder_writes_file(self, tmp_path):
    from crafter_tpu.recorder import VideoRecorder

    class RenderEnv(FakeEnv):
      def render(self, size):
        return np.zeros(tuple(size) + (3,), np.uint8)

    env = VideoRecorder(RenderEnv(), tmp_path, size=(64, 64))
    env.reset()
    done = False
    while not done:
      _, _, done, _ = env.step(0)
    files = list(tmp_path.glob('*.mp4')) + list(tmp_path.glob('*.gif'))
    assert len(files) == 1
