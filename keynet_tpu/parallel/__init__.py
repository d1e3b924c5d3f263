from .sharding import (batch_mesh, shard_batch, keyed_forward_sharded,
                       replicate_ops)
