"""crafter_tpu — a TPU-native (JAX/XLA) rebuild of the Crafter benchmark.

The public surface mirrors the reference package (``crafter/__init__.py:1-2``
exports ``Env`` and ``Recorder``) and adds the batched functional core that
is the reason this framework exists.
"""

__version__ = '0.1.0'

from .config import EnvConfig, DEFAULT_CONFIG
from . import rules

# Heavier modules (env, recorder) are imported lazily so that pure-table
# users do not pay JAX import cost; see __getattr__ below.
_LAZY = {
    'Env': ('crafter_tpu.env', 'Env'),
    'Recorder': ('crafter_tpu.recorder', 'Recorder'),
    'StatsRecorder': ('crafter_tpu.recorder', 'StatsRecorder'),
    'VideoRecorder': ('crafter_tpu.recorder', 'VideoRecorder'),
    'EpisodeRecorder': ('crafter_tpu.recorder', 'EpisodeRecorder'),
    'VecStatsRecorder': ('crafter_tpu.recorder', 'VecStatsRecorder'),
    'CrafterEnv': ('crafter_tpu.env', 'CrafterEnv'),
    'VecEnv': ('crafter_tpu.env', 'VecEnv'),
    'GymnasiumEnv': ('crafter_tpu.env', 'GymnasiumEnv'),
    'register_gym_envs': ('crafter_tpu.env', 'register_gym_envs'),
    'PPO': ('crafter_tpu.ppo', 'PPO'),
    'PPOConfig': ('crafter_tpu.ppo', 'PPOConfig'),
    'ParityEnv': ('crafter_tpu.parity', 'ParityEnv'),
}


def __getattr__(name):
  if name in _LAZY:
    import importlib
    module, attr = _LAZY[name]
    return getattr(importlib.import_module(module), attr)
  raise AttributeError(name)
