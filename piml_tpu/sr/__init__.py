from piml_tpu.sr.extract import (  # noqa: F401
    direction_filter,
    post_filter,
    prepare_symbolic_regression_data,
    prepare_symbolic_regression_data_polar,
    prepare_vector_regression_data,
)
from piml_tpu.sr.fit import (  # noqa: F401
    ForceLawFit,
    HAVE_PYSR,
    VectorForceLawFit,
    fit_force_law,
    fit_force_law_mse,
    fit_vector_force_law,
    symbolic_regression,
)
from piml_tpu.sr.gp import (  # noqa: F401
    Equation,
    GPSymbolicRegressor,
)
