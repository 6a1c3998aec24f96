from piml_tpu.ops.pairwise import topk_neighbors_pallas  # noqa: F401
from piml_tpu.ops.banded import (  # noqa: F401
    topk_neighbors_banded,
    topk_neighbors_banded_or_dense,
)
from piml_tpu.ops.grid_pairs import (  # noqa: F401
    build_cell_index,
    grid_topk_neighbors,
    topk_neighbors_grid,
)
