"""Multi-chip parallelism.

The reference scales out via CDN + stateless replicas (SURVEY.md §2.3); the
TPU-native scale axes here are expressed with ``jax.sharding`` over a device
mesh so multi-chip is configuration, not code:

- **data**: the request batch shards across chips (the analogue of
  "one request = one tokio task").
- **space**: oversized images shard spatially; the separable-matmul
  formulation turns halo exchange into a sharded contraction whose
  collective (psum/reduce-scatter) XLA inserts automatically
  (SURVEY.md §5.7/§5.8).
"""

from imagekit_tpu.parallel.mesh import get_mesh, make_mesh  # noqa: F401
from imagekit_tpu.parallel.sharding import (  # noqa: F401
    sharded_resample,
    shard_batch,
)
