from apg_trajectory_tracking_tpu.controllers.mpc import MPC  # noqa: F401
