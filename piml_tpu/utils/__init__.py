from piml_tpu.utils.logging import MetricLogger  # noqa: F401
