from cmtts_tpu.parallel.sharding import (
    make_mesh,
    shard_batch,
    replicate_state,
    data_sharding,
)
