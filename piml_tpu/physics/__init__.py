from piml_tpu.physics import features, forces, polar  # noqa: F401
from piml_tpu.physics.features import (  # noqa: F401
    NeighborConfig,
    collision_detection,
    collision_detection_single_frame,
    collision_label,
    desired_speed,
    heading_direction,
    history_velocity,
    move_index_matrix,
    nearby_in_sight,
    relative_features,
    turn_detection,
)
