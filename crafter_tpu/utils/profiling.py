"""Profiling helpers (SURVEY.md §5: the reference only wall-clock-times its
random-policy harness, crafter/run_random.py:28-43; here device traces are
first-class)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str):
  """Capture a jax.profiler device trace viewable in TensorBoard/XProf."""
  import jax
  jax.profiler.start_trace(logdir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class Timer:
  """Tiny wall-clock section timer for host-side loops."""

  def __init__(self):
    self.sections = {}

  @contextlib.contextmanager
  def section(self, name: str):
    t0 = time.perf_counter()
    try:
      yield
    finally:
      self.sections[name] = (self.sections.get(name, 0.0)
                             + time.perf_counter() - t0)

  def report(self) -> str:
    total = sum(self.sections.values()) or 1.0
    lines = [f'{name:<20} {dt:8.3f}s {100 * dt / total:5.1f}%'
             for name, dt in sorted(self.sections.items(),
                                    key=lambda kv: -kv[1])]
    return '\n'.join(lines)
