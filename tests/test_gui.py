"""GuiSession smoke tests — the pygame loop's draw/advance/death logic
actually executes headless (VERDICT r4 weak #7).

``SDL_VIDEODRIVER=dummy`` gives pygame a real (offscreen) display, so
``draw`` exercises the full frame path: env render -> PIL resize ->
surfarray -> blit -> flip.
"""

import argparse
import json
import os
import pathlib

import pytest

os.environ.setdefault('SDL_VIDEODRIVER', 'dummy')
pygame = pytest.importorskip('pygame')


def _args(tmp, **kw):
  ns = dict(seed=1, area=(64, 64), view=(9, 9), length=12, health=9,
            window=(96, 96), size=(64, 64), record=None, fps=1000,
            wait=False, death='reset')
  ns.update(kw)
  return argparse.Namespace(**ns)


def _session(tmp_path, **kw):
  import crafter_tpu
  from crafter_tpu.run_gui import GuiSession
  args = _args(tmp_path, **kw)
  env = crafter_tpu.Env(area=args.area, view=args.view, length=args.length,
                        seed=args.seed)
  if args.record:
    env = crafter_tpu.Recorder(env, args.record, save_video=False,
                               save_episode=False)
  env.reset()
  pygame.init()
  return GuiSession(env, args, pygame), env


def _drive(session, ticks):
  for _ in range(ticks):
    if not session.running:
      break
    session.draw()
    action = session.read_action()   # None headless -> noop
    session.advance(action or 'do')


class TestGuiSession:
  def test_death_reset_starts_new_episode(self, tmp_path, capsys):
    session, _ = _session(tmp_path, death='reset', length=6)
    _drive(session, 15)
    out = capsys.readouterr().out
    # The 6-step cap ended an episode mid-drive and the reset branch ran.
    assert 'Episode done!' in out
    assert 'Starting a new episode.' in out
    assert session.running
    assert session.steps < 15      # bookkeeping restarted
    pygame.quit()

  def test_death_quit_stops_the_loop(self, tmp_path, capsys):
    session, _ = _session(tmp_path, death='quit', length=4)
    _drive(session, 10)
    assert not session.running
    assert 'Episode done!' in capsys.readouterr().out
    pygame.quit()

  def test_record_writes_stats(self, tmp_path):
    rec_dir = tmp_path / 'rec'
    session, env = _session(tmp_path, record=str(rec_dir), length=5,
                            death='reset')
    _drive(session, 12)
    stats = rec_dir / 'stats.jsonl'
    assert stats.exists()
    rows = [json.loads(line) for line in stats.read_text().splitlines()]
    assert rows and all(r['length'] == 5 for r in rows)
    pygame.quit()

  def test_run_loop_quits_on_escape_event(self, tmp_path):
    session, _ = _session(tmp_path, death='continue', length=50)
    pygame.event.post(pygame.event.Event(
        pygame.KEYDOWN, key=pygame.K_ESCAPE))
    session.run()                  # returns because ESC flips running
    assert not session.running
