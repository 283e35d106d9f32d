from .mesh import make_mesh, batch_sharding, replicate_sharding
from .sharded_step import make_sharded_train_step

__all__ = ["make_mesh", "batch_sharding", "replicate_sharding",
           "make_sharded_train_step"]
