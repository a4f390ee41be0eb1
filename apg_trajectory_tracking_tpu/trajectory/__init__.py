from apg_trajectory_tracking_tpu.trajectory.minjerk import (  # noqa: F401
    min_jerk_reference,
    linear_reference,
)
from apg_trajectory_tracking_tpu.trajectory.generate import (  # noqa: F401
    generate_trajectory_bank,
    load_trajectory_bank,
    prepare_trajectory,
)
