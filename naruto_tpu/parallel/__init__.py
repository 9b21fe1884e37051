from naruto_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from naruto_tpu.parallel.sharded import (
    sharded_grad_step, sharded_volume_query,
)

__all__ = ["make_mesh", "data_sharding", "replicated",
           "sharded_grad_step", "sharded_volume_query"]
