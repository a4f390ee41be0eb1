"""MPC baseline tests: the shooting solver must actually control the
systems closed-loop."""

import numpy as np
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.controllers.mpc import MPC
from apg_trajectory_tracking_tpu.dynamics.cartpole import (
    cartpole_params,
    cartpole_step,
)
from apg_trajectory_tracking_tpu.dynamics.quad import quad_params, quad_step
from apg_trajectory_tracking_tpu.dynamics.fixed_wing_2d import (
    wing2d_params,
    wing2d_step,
)


def test_mpc_cartpole_balances():
    """From a small perturbation, MPC keeps the pole upright for 100 steps."""
    mpc = MPC(horizon=10, dt=0.05, dynamics="cartpole", n_iters=60, lr=0.2)
    dyn = cartpole_params()
    state = np.array([[0.1, 0.0, 0.15, 0.0]], dtype=np.float32)
    for _ in range(100):
        actions = mpc.predict_actions(state[0])
        state = np.asarray(
            cartpole_step(dyn, jnp.asarray(state), jnp.asarray(actions[:1]), 0.05)
        )
        assert abs(state[0, 2]) < 0.5, f"pole fell: {state}"
    assert abs(state[0, 2]) < 0.2


def test_mpc_quad_hovers():
    """MPC holds the quad near a hover reference."""
    mpc = MPC(horizon=10, dt=0.1, dynamics="flightmare", n_iters=60, lr=0.15)
    dyn = quad_params()
    state = np.zeros((1, 12), dtype=np.float32)
    state[0, 2] = 3.0
    state[0, 6:9] = [0.3, -0.2, 0.1]  # initial velocity perturbation
    ref = np.zeros((10, 9), dtype=np.float32)
    ref[:, 2] = 3.0
    max_err = 0.0
    for _ in range(50):
        actions = mpc.predict_actions(state[0], ref)
        state = np.asarray(
            quad_step(dyn, jnp.asarray(state), jnp.asarray(actions[:1]), 0.1)
        )
        max_err = max(max_err, abs(state[0, 2] - 3.0))
    final_err = np.linalg.norm(state[0, :3] - np.array([0, 0, 3.0]))
    # drifts in xy are fine (no xy ref motion); altitude must hold
    assert abs(state[0, 2] - 3.0) < 0.5, f"altitude err {state[0, 2]}"
    assert np.linalg.norm(state[0, 6:9]) < 1.0, "velocity not damped"


def test_mpc_wing2d_tracks_altitude():
    """2D wing MPC steers toward a straight-line climb reference."""
    mpc = MPC(horizon=20, dt=0.05, dynamics="fixed_wing_2D", n_iters=60, lr=0.2)
    dyn = wing2d_params()
    state = np.array([[0, 0, 11.5, 0, 0, 0]], dtype=np.float32)
    target = np.array([50.0, 2.0])
    for _ in range(60):
        actions = mpc.predict_actions(state[0], target)
        state = np.asarray(
            wing2d_step(dyn, jnp.asarray(state), jnp.asarray(actions[:1]), 0.05)
        )
    # moved forward and climbed toward h=2 along the ramp
    assert state[0, 0] > 20.0
    assert state[0, 1] > 0.3


def test_mpc_warm_start_reset():
    mpc = MPC(horizon=5, dt=0.05, dynamics="cartpole", n_iters=10)
    _ = mpc.predict_actions(np.array([0.1, 0, 0.1, 0]))
    z_after = np.asarray(mpc._z).copy()
    mpc.reset()
    assert not np.allclose(np.asarray(mpc._z), z_after)
