from piml_tpu.parallel.sharding import (  # noqa: F401
    make_dp_finetune_step,
    make_dp_pointwise_step,
    make_mesh,
    replicate,
    shard_channeled_batch,
    shard_leading,
)
