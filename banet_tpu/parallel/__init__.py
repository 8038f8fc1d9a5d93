from banet_tpu.parallel.mesh import make_mesh, local_mesh  # noqa: F401
from banet_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    replicated,
    shard_batch,
)
from banet_tpu.parallel.window_ba import sharded_window_ba_step  # noqa: F401
