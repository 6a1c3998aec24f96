from piml_tpu.parallel.sharding import (  # noqa: F401
    make_dp_finetune_step,
    make_dp_pointwise_step,
    make_mesh,
    replicate,
    pad_channels,
    pad_channels_stacked,
    shard_channeled_batch,
    shard_stacked_channeled,
    shard_leading,
)
from piml_tpu.parallel.agent_shard import (  # noqa: F401
    sharded_banded_features,
    ring_topk_neighbors,
    sharded_relative_features,
)
from piml_tpu.parallel.metrics_shard import (  # noqa: F401
    sharded_mmd,
    sharded_mmd_with_time_mask,
    sharded_ot_with_time_mask,
    sharded_sinkhorn,
)
from piml_tpu.parallel.tensor_parallel import (  # noqa: F401
    make_tp_apply,
    make_tp_dp_finetune_step,
    shard_params_tp,
    tp_param_shardings,
)
from piml_tpu.parallel.distributed import (  # noqa: F401
    init_distributed,
    is_multi_host,
)
