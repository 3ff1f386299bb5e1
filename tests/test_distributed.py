"""Real multi-process `jax.distributed` test (SURVEY.md §4(d)).

Spawns two OS processes, each with 4 virtual CPU devices, that form one
8-device global mesh via a localhost coordinator and step a sharded env
batch through the production `vec_reset`/`vec_step` path with a
cross-process stats psum.  This exercises `distributed_init`
(crafter_tpu/parallel/mesh.py) for real — the single-process 8-device
tests in test_sharding.py validate SPMD semantics but never open the
coordination service.
"""

import pathlib
import socket
import subprocess
import sys

import pytest

WORKER = pathlib.Path(__file__).parent.parent / 'tools' / 'dist_worker.py'


def _free_port() -> int:
  with socket.socket() as s:
    s.bind(('localhost', 0))
    return s.getsockname()[1]


@pytest.mark.timeout(600)
def test_two_process_cluster_steps_sharded_envs():
  port = _free_port()
  nproc = 2
  procs = [
      subprocess.Popen(
          [sys.executable, str(WORKER), str(pid), str(nproc), str(port)],
          stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
          cwd=str(WORKER.parent.parent))
      for pid in range(nproc)
  ]
  outs = []
  try:
    for p in procs:
      out, _ = p.communicate(timeout=540)
      outs.append(out)
  except subprocess.TimeoutExpired:
    for p in procs:
      p.kill()
    pytest.fail('distributed workers timed out\n' + '\n'.join(outs))
  for pid, (p, out) in enumerate(zip(procs, outs)):
    assert p.returncode == 0, f'worker {pid} failed:\n{out[-3000:]}'
    assert 'DIST OK' in out, f'worker {pid} missing OK line:\n{out[-3000:]}'
