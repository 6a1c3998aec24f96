from piml_tpu.ops.pairwise import topk_neighbors_pallas  # noqa: F401
