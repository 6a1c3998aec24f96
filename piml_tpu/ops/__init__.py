from piml_tpu.ops.pairwise import topk_neighbors_pallas  # noqa: F401
from piml_tpu.ops.grid_pairs import (  # noqa: F401
    build_cell_index,
    grid_topk_neighbors,
    topk_neighbors_grid,
)
