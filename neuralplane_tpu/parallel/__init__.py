from .mesh import (make_mesh, shard_env_state, shard_batch,
                   shard_batch_tree, replicate)
