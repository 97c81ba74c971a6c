from .mesh import (make_mesh, shard_env_state, shard_batch,
                   shard_batch_tree, replicate)
from .distributed import init_distributed, make_global_mesh
