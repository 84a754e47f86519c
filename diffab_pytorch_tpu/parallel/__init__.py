from diffab_pytorch_tpu.parallel.mesh import (
    DP_AXIS,
    TP_AXIS,
    batch_sharding,
    make_mesh,
    param_sharding,
    put_global,
    replicated,
)
from diffab_pytorch_tpu.parallel.dp import (
    make_dp_train_step,
    make_sharded_train_step,
    replicate_batch,
    sample_fanout_sharded,
    sample_sharded,
    score_fanout_sharded,
    shard_state,
)
