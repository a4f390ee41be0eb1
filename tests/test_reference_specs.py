"""Executable versions of the reference's test sketches
(tests/unittests.py, tests/run_wing_sim.py, tests/test_generate_trajectories.py
— the upstream files don't import their subjects / are manual demos)."""

import numpy as np
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.trajectory import refs
from apg_trajectory_tracking_tpu.trajectory.quaternions import project_to_line


def test_project_pythagoras():
    """unittests.py:6-24: projection satisfies Pythagoras."""
    rng = np.random.RandomState(0)
    for _ in range(4):
        a = rng.randn(3)
        b = rng.randn(3)
        p = rng.randn(3)
        res = project_to_line(a, b, p)
        assert np.isclose(
            np.sum((p - a) ** 2),
            np.sum((res - a) ** 2) + np.sum((res - p) ** 2),
        )
    # jnp version agrees
    res_j = np.asarray(
        refs.project_to_line(
            jnp.asarray(a, jnp.float32),
            jnp.asarray(b, jnp.float32),
            jnp.asarray(p, jnp.float32),
        )
    )
    np.testing.assert_allclose(res_j, res, atol=1e-5)


def test_circle_next_target_distance():
    """unittests.py:26-37: the next target lies ~dist away from the point
    when the point is on the circle."""
    c = refs.CircleState(
        mid_point=jnp.array([1.0, 2.0, 3.0]),
        radius=jnp.asarray(2.0),
        direction=jnp.asarray(1.0),
    )
    point = jnp.array([-1.0, 2.0, 3.0])  # on the circle (plane x-z? use x-y)
    # use plane (0, 1): point is radius away from mid in-plane
    proj = np.asarray(refs.circle_project(c, point, (0, 1)))
    assert abs(np.linalg.norm(proj[:2] - np.array([1.0, 2.0])) - 2.0) < 1e-5


def test_wing_open_loop_flight():
    """run_wing_sim.py:1-40: constant moderate action for 10 s produces a
    plausible forward flight (no NaN, forward progress, bounded attitude)."""
    from apg_trajectory_tracking_tpu.dynamics.fixed_wing import (
        wing_params,
        wing_step,
    )

    params = wing_params()
    state = jnp.zeros((1, 12)).at[0, 3].set(11.5)
    action = jnp.asarray([[0.25, 0.5, 0.5, 0.5]])
    for _ in range(200):  # 10 s at dt=0.05
        state = wing_step(params, state, action, 0.05)
    s = np.asarray(state)[0]
    assert np.all(np.isfinite(s))
    assert s[0] > 50.0, f"no forward progress: {s}"
    assert abs(s[6]) < 0.5, f"rolled over: {s}"


def test_generated_trajectory_trackable():
    """test_generate_trajectories.py spirit: a perfect velocity-following
    'controller' stays near the reference."""
    from apg_trajectory_tracking_tpu.trajectory.generate import (
        generate_one_trajectory,
        prepare_trajectory,
    )

    traj = generate_one_trajectory(seed=77)
    ref = prepare_trajectory(traj, dt=0.1, speed_factor=0.5)
    pos = ref[0, :3].copy()
    errs = []
    # prepared vel = v_raw * 2*sf and positions advance v_raw * dt * sf per
    # row, so the per-row position step is stored_vel * dt / 2
    for i in range(1, len(ref)):
        pos = pos + ref[i - 1, 6:9] * 0.1 / 2.0
        errs.append(np.linalg.norm(pos - ref[i, :3]))
    assert np.max(errs) < 0.6, f"integrated velocity diverges: {np.max(errs)}"
