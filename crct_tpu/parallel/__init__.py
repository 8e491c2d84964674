"""Data-parallel runtime over a jax.sharding.Mesh.

Replaces the reference's torch DDP/NCCL stack (CRCT/train.py:22-28,139-143,
184-191): one JAX process per host, a 1-D ``data`` mesh over all devices,
batches sharded on the data axis, parameters replicated. Gradient and metric
reductions are XLA collectives inserted automatically by jit from the
sharding annotations — no explicit NCCL calls to translate.
"""

from crct_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                    maybe_initialize_distributed,
                                    replicated_sharding, shard_batch)
