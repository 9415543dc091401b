from expann_tpu.parallel.sharded import (
    ShardedIndex,
    build_sharded,
    make_mesh,
    replicated_query_dp,
    sharded_build_step,
    sharded_query_batch,
)

__all__ = [
    "ShardedIndex",
    "build_sharded",
    "make_mesh",
    "replicated_query_dp",
    "sharded_build_step",
    "sharded_query_batch",
]
