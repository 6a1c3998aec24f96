from piml_tpu.utils.logging import MetricLogger  # noqa: F401
from piml_tpu.utils.analysis import rollout_mae_powerlaw  # noqa: F401
from piml_tpu.utils import checks, profiling  # noqa: F401
