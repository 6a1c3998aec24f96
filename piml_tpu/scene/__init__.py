from piml_tpu.scene import codec  # noqa: F401
from piml_tpu.scene.scene import (  # noqa: F401
    Scene,
    mirror,
    random_walk_noise,
    rotate,
)
