"""Recorder wrappers: per-episode stats, video, and transition dumps.

Same composable-wrapper design and on-disk formats as the reference
(reference: crafter/recorder.py:9-185) so the analysis pipeline consumes
either engine's output unchanged:

* ``stats.jsonl`` — one JSON object per episode:
  ``{"length": L, "reward": R, "achievement_<name>": count, ...}``
  (recorder.py:53-66);
* ``<ts>-ach<N>-len<L>.mp4`` — episode video (recorder.py:85-99);
* ``<ts>-ach<N>-len<L>.npz`` — full transition arrays (recorder.py:117-152).

``VecStatsRecorder`` is the batched-path equivalent: it accumulates
per-env episode length/return on the host from the small per-step
(reward, done, achievements) arrays and emits the identical ``stats.jsonl``
lines at episode boundaries.
"""

from __future__ import annotations

import datetime
import json
import pathlib

import numpy as np


class Recorder:
  """crafter/recorder.py:9-25."""

  def __init__(self, env, directory, save_stats=True, save_video=True,
               save_episode=True, video_size=(512, 512)):
    if directory and save_stats:
      env = StatsRecorder(env, directory)
    if directory and save_video:
      env = VideoRecorder(env, directory, video_size)
    if directory and save_episode:
      env = EpisodeRecorder(env, directory)
    self._env = env

  def __getattr__(self, name):
    if name.startswith('__'):
      raise AttributeError(name)
    return getattr(self._env, name)


class StatsRecorder:
  """crafter/recorder.py:28-66."""

  def __init__(self, env, directory):
    self._env = env
    self._directory = pathlib.Path(directory).expanduser()
    self._directory.mkdir(exist_ok=True, parents=True)
    self._file = (self._directory / 'stats.jsonl').open('a')
    self._length = None
    self._reward = None

  def __getattr__(self, name):
    if name.startswith('__'):
      raise AttributeError(name)
    return getattr(self._env, name)

  def reset(self):
    obs = self._env.reset()
    self._length = 0
    self._reward = 0
    return obs

  def step(self, action):
    obs, reward, done, info = self._env.step(action)
    self._length += 1
    self._reward += info['reward']
    if done:
      stats = {'length': self._length, 'reward': round(self._reward, 1)}
      for key, value in info['achievements'].items():
        stats[f'achievement_{key}'] = value
      self._file.write(json.dumps(stats) + '\n')
      self._file.flush()
    return obs, reward, done, info


class VideoRecorder:
  """crafter/recorder.py:69-99."""

  def __init__(self, env, directory, size=(512, 512)):
    if not hasattr(env, 'episode_name'):
      env = EpisodeName(env)
    self._env = env
    self._directory = pathlib.Path(directory).expanduser()
    self._directory.mkdir(exist_ok=True, parents=True)
    self._size = size
    self._frames = None

  def __getattr__(self, name):
    if name.startswith('__'):
      raise AttributeError(name)
    return getattr(self._env, name)

  def reset(self):
    obs = self._env.reset()
    self._frames = [self._env.render(self._size)]
    return obs

  def step(self, action):
    obs, reward, done, info = self._env.step(action)
    self._frames.append(self._env.render(self._size))
    if done:
      import imageio
      try:
        filename = str(self._directory / (self._env.episode_name + '.mp4'))
        imageio.mimsave(filename, self._frames)
      except Exception:  # mp4 needs imageio-ffmpeg; gif is always available
        filename = str(self._directory / (self._env.episode_name + '.gif'))
        imageio.mimsave(filename, self._frames)
    return obs, reward, done, info


class EpisodeRecorder:
  """crafter/recorder.py:102-152."""

  def __init__(self, env, directory):
    if not hasattr(env, 'episode_name'):
      env = EpisodeName(env)
    self._env = env
    self._directory = pathlib.Path(directory).expanduser()
    self._directory.mkdir(exist_ok=True, parents=True)
    self._episode = None

  def __getattr__(self, name):
    if name.startswith('__'):
      raise AttributeError(name)
    return getattr(self._env, name)

  def reset(self):
    obs = self._env.reset()
    self._episode = [{'image': obs}]
    return obs

  def step(self, action):
    obs, reward, done, info = self._env.step(action)
    transition = {
        'action': action, 'image': obs, 'reward': reward, 'done': done,
    }
    for key, value in info.items():
      if key in ('inventory', 'achievements'):
        continue
      transition[key] = value
    for key, value in info['achievements'].items():
      transition[f'achievement_{key}'] = value
    for key, value in info['inventory'].items():
      transition[f'ainventory_{key}'] = value
    self._episode.append(transition)
    if done:
      self._save()
    return obs, reward, done, info

  def _save(self):
    filename = str(self._directory / (self._env.episode_name + '.npz'))
    # Zero-fill keys missing at the first time step (recorder.py:145-148).
    for key, value in self._episode[1].items():
      if key not in self._episode[0]:
        self._episode[0][key] = np.zeros_like(value)
    episode = {
        k: np.array([step[k] for step in self._episode])
        for k in self._episode[0]}
    np.savez_compressed(filename, **episode)


class EpisodeName:
  """crafter/recorder.py:155-185: `{timestamp}-ach{N}-len{L}` names."""

  def __init__(self, env):
    self._env = env
    self._timestamp = None
    self._unlocked = None
    self._length = None

  def __getattr__(self, name):
    if name.startswith('__'):
      raise AttributeError(name)
    return getattr(self._env, name)

  def reset(self):
    obs = self._env.reset()
    self._timestamp = None
    self._unlocked = None
    self._length = 0
    return obs

  def step(self, action):
    obs, reward, done, info = self._env.step(action)
    self._length += 1
    if done:
      self._timestamp = datetime.datetime.now().strftime('%Y%m%dT%H%M%S')
      self._unlocked = sum(
          int(v >= 1) for v in info['achievements'].values())
    return obs, reward, done, info

  @property
  def episode_name(self):
    return f'{self._timestamp}-ach{self._unlocked}-len{self._length}'


class VecStatsRecorder:
  """Batched-path stats: one `stats.jsonl` line per finished episode.

  Feed it each step's ``(reward, done, achievements)`` batch (host numpy or
  device arrays); episode returns accumulate ``info['reward']`` exactly like
  ``StatsRecorder`` (recorder.py:53-62).
  """

  def __init__(self, num_envs: int, directory):
    from . import rules
    self._names = rules.ACHIEVEMENTS
    self._directory = pathlib.Path(directory).expanduser()
    self._directory.mkdir(exist_ok=True, parents=True)
    self._file = (self._directory / 'stats.jsonl').open('a')
    self._length = np.zeros((num_envs,), np.int64)
    self._reward = np.zeros((num_envs,), np.float64)

  def add(self, reward, done, achievements):
    reward = np.asarray(reward)
    done = np.asarray(done)
    self._length += 1
    self._reward += reward
    if done.any():
      achievements = np.asarray(achievements)
      for i in np.flatnonzero(done):
        stats = {'length': int(self._length[i]),
                 'reward': round(float(self._reward[i]), 1)}
        for j, name in enumerate(self._names):
          stats[f'achievement_{name}'] = int(achievements[i, j])
        self._file.write(json.dumps(stats) + '\n')
      self._file.flush()
      self._length[done] = 0
      self._reward[done] = 0.0
