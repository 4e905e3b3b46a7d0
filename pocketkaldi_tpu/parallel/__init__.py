from .mesh import (DATA_AXIS, MODEL_AXIS, data_sharding, make_mesh,  # noqa: F401
                   pad_batch_to_shards, replicated)
from .pipeline import ShardedPipeline, shard_nnet_params  # noqa: F401
