from piml_tpu.models.blocks import MLP, AttnPooling, ResBlock, ResDNN, activation_fn  # noqa: F401
from piml_tpu.models.mlapm import MLAPMParams, mlapm_force, mlapm_step  # noqa: F401
from piml_tpu.models.zoo import (  # noqa: F401
    BaseSim,
    BaseTest,
    ModelOutput,
    ModelSpec,
    PINNSF,
    build_finetune_model,
    build_model,
    pretrain_model_name,
)
