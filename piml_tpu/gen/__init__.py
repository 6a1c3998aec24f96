from piml_tpu.gen.route import route  # noqa: F401
from piml_tpu.gen.scenarios import SCENARIOS  # noqa: F401
from piml_tpu.gen.socialforce import (  # noqa: F401
    SFParams,
    SpawnSchedule,
    simulate,
    social_force,
    to_scene,
)
from piml_tpu.gen.mlapm_sim import (  # noqa: F401
    circle_demo,
    regenerate_scenario_npy,
    simulate_mlapm,
)
