"""Multi-chip / multi-host utilities.

The reference is single-process, single-env CPU code (SURVEY.md §2: no
distributed components exist).  Here scale-out is first-class: env batches
shard across a `jax.sharding.Mesh` ('dp' axis), stats reduce with XLA
collectives, and the learner's gradient all-reduce falls out of the
sharded global-mean loss (crafter_tpu/ppo.py:make_sharded_train).
"""

from .mesh import (dp_mesh, shard_batch, replicate, distributed_init,
                   psum_stats)
