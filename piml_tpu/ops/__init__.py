from piml_tpu.ops.pairwise import topk_neighbors_pallas  # noqa: F401
from piml_tpu.ops.binned import BinnedConfig, binned_neighbors  # noqa: F401
