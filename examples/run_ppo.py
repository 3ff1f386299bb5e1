"""PPO on Crafter (reference: examples/run_ppo.py:1-21).

The reference wraps one Python env in SB3's PPO; here the entire
actor-learner loop runs on device (see crafter_tpu/ppo.py).  This thin
example mirrors the reference's scale (1M env steps):

    python examples/run_ppo.py
"""

from crafter_tpu import run_train


if __name__ == '__main__':
  import sys
  sys.argv = [sys.argv[0], '--steps', '1000000', '--outdir', 'logdir/ppo',
              *sys.argv[1:]]
  run_train.main()
