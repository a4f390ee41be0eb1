"""Tests for the trajectory subsystem: min-jerk planner parity, GP dataset
generation integrity (flatness checks), reference windows, circle geometry."""

import numpy as np
import pytest
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.trajectory.minjerk import (
    min_jerk_reference,
    linear_reference,
)
from apg_trajectory_tracking_tpu.trajectory.generate import (
    generate_one_trajectory,
    prepare_trajectory,
)
from apg_trajectory_tracking_tpu.trajectory.quaternions import (
    quaternion_to_euler,
    euler_to_quaternion,
    q_mult,
    q_conjugate,
)
from apg_trajectory_tracking_tpu.trajectory import refs

from tests.reference_oracle import load_reference_dynamics

RNG = np.random.RandomState(7)


def test_min_jerk_matches_reference():
    """Compare against the reference RapidTrajectory implementation
    (numpy, no torch/casadi needed)."""
    load_reference_dynamics()  # puts /root/reference on sys.path (or skips)
    from neural_control.trajectory.plan_trajectory import get_reference

    for _ in range(5):
        pos0 = RNG.randn(3)
        vel0 = RNG.randn(3)
        acc0 = RNG.randn(3) * 0.5
        posf = RNG.randn(3) * 2
        velf = RNG.randn(3)
        expected = get_reference(
            pos0, vel0, acc0, posf, velf, delta_t=0.1, ref_length=10
        )
        got = np.asarray(
            min_jerk_reference(
                jnp.asarray(pos0, jnp.float32),
                jnp.asarray(vel0, jnp.float32),
                jnp.asarray(acc0, jnp.float32),
                jnp.asarray(posf, jnp.float32),
                jnp.asarray(velf, jnp.float32),
                0.1,
                10,
            )
        )
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_min_jerk_endpoints():
    """Planner hits the goal state at t = Tf."""
    pos0, vel0, acc0 = jnp.zeros(3), jnp.ones(3), jnp.zeros(3)
    posf, velf = jnp.array([1.0, 2.0, 3.0]), jnp.array([0.5, 0.0, -0.5])
    ref = min_jerk_reference(pos0, vel0, acc0, posf, velf, 0.05, 10)
    np.testing.assert_allclose(np.asarray(ref[-1, :3]), np.asarray(posf), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref[-1, 3:6]), np.asarray(velf), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref[-1, 6:9]), np.zeros(3), atol=1e-3)


def test_linear_reference_shape():
    ref = linear_reference(jnp.zeros(3), jnp.zeros(3), jnp.ones(3), jnp.zeros(3), 10)
    assert ref.shape == (10, 9)
    np.testing.assert_allclose(np.asarray(ref[-1, :3]), np.ones(3), atol=1e-6)


def test_generated_trajectory_flatness():
    """Property test in the spirit of check_trajectory
    (generate_trajectory.py:49-155): stored velocity consistent with numeric
    derivative of position; attitude thrust axis aligned with acceleration;
    trajectory within the arena; smooth start/end."""
    traj = generate_one_trajectory(seed=123, duration=10.0, dt=0.01)
    assert traj.shape == (1000, 10)
    pos, att, vel = traj[:, :3], traj[:, 3:7], traj[:, 7:10]

    # velocity consistency
    vel_num = np.gradient(pos, axis=0) / 0.01
    err = np.abs(vel_num[20:-20] - vel[20:-20]).max()
    assert err < 0.1, f"stored vs numeric velocity differs by {err}"

    # attitude: body z axis == normalized thrust (acc + g e_z)
    acc = np.gradient(vel, axis=0) / 0.01
    thrust = acc + np.array([0, 0, 9.81])
    z_b_expected = thrust / np.linalg.norm(thrust, axis=1, keepdims=True)
    w, x, y, z = att[:, 0], att[:, 1], att[:, 2], att[:, 3]
    z_b = np.stack(
        [2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y)],
        axis=1,
    )
    dot = np.sum(z_b[30:-30] * z_b_expected[30:-30], axis=1)
    assert np.all(dot > 0.99), f"attitude/thrust misaligned: min dot {dot.min()}"

    # arena bounds (with smoothing slack)
    from apg_trajectory_tracking_tpu.trajectory.generate import ARENA_MAX, ARENA_MIN

    assert np.all(pos <= ARENA_MAX + 0.5) and np.all(pos >= ARENA_MIN - 0.5)

    # smooth start: near-zero velocity at both ends
    assert np.linalg.norm(vel[0]) < 0.5 and np.linalg.norm(vel[-1]) < 0.5

    # quaternions normalized
    np.testing.assert_allclose(np.linalg.norm(att, axis=1), 1.0, atol=1e-5)


def test_prepare_trajectory_semantics():
    """Subsampling stride + the euler*sf / vel*2sf scaling quirks
    (generate_trajectory.py:586-603)."""
    traj = generate_one_trajectory(seed=5, duration=10.0, dt=0.01)
    out = prepare_trajectory(traj, dt=0.1, speed_factor=0.6)
    assert out.shape == (len(traj[::6]), 9)
    expected_euler = quaternion_to_euler(traj[::6][:, 3:7]) * 0.6
    np.testing.assert_allclose(out[:, 3:6], expected_euler, atol=1e-5)
    np.testing.assert_allclose(out[:, 6:9], traj[::6][:, 7:10] * 1.2, atol=1e-5)


def test_prepare_trajectory_noninteger_stride():
    """Non-integer dt/0.01*speed strides truncate gracefully like the
    reference's int() (generate_trajectory.py:587) instead of crashing —
    regression for --speed 0.25."""
    traj = generate_one_trajectory(seed=6, duration=5.0, dt=0.01)
    out = prepare_trajectory(traj, dt=0.1, speed_factor=0.25)  # stride 2.5
    assert out.shape == (len(traj[::2]), 9)
    np.testing.assert_allclose(out[:, :3], traj[::2][:, :3], atol=1e-6)
    # tiny speeds: stride clamps to 1
    out2 = prepare_trajectory(traj, dt=0.1, speed_factor=0.05)
    assert out2.shape[0] == len(traj)


def test_quaternion_roundtrip():
    rpy = (RNG.rand(20, 3) - 0.5) * np.array([2.0, 1.5, 4.0])
    q = euler_to_quaternion(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    back = quaternion_to_euler(q)
    np.testing.assert_allclose(back, rpy, atol=1e-6)
    # q * q^-1 = identity
    ident = q_mult(q, q_conjugate(q))
    np.testing.assert_allclose(ident[:, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(ident[:, 1:], 0.0, atol=1e-6)


def test_array_ref_window_padding():
    ref = jnp.asarray(np.arange(20 * 9, dtype=np.float32).reshape(20, 9))
    w = refs.array_ref_window(ref, 5, 10)
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref[6:16]))
    # near the end: rows past T-1 pin position to the last point, rest zero
    w_end = np.asarray(refs.array_ref_window(ref, 15, 10))
    np.testing.assert_allclose(w_end[:4], np.asarray(ref[16:20]))
    np.testing.assert_allclose(
        w_end[4:, :3], np.tile(np.asarray(ref[-1, :3]), (6, 1))
    )
    np.testing.assert_allclose(w_end[4:, 3:], np.zeros((6, 6)))


def test_circle_geometry():
    """Projection lies on the circle; reference targets move along it."""
    c = refs.circle_init(
        jnp.array([1.0, 0.0, 2.0]), jnp.array([0.0, 1.0, 0.0]),
        radius=2.0, direction=1.0, plane=(0, 1),
    )
    # center is radius away from the drone in-plane
    mid = np.asarray(c.mid_point)
    assert abs(np.linalg.norm(mid[:2] - np.array([1.0, 0.0])) - 2.0) < 1e-5
    assert mid[2] == pytest.approx(2.0)

    proj = np.asarray(circle_proj := refs.circle_project(c, jnp.array([1.0, 0.0, 2.0]), (0, 1)))
    assert abs(np.linalg.norm(proj[:2] - mid[:2]) - 2.0) < 1e-5

    window = np.asarray(
        refs.circle_ref_window(
            c, jnp.array([1.0, 0, 2.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0]),
            0.1, 10, 0.5, (0, 1),
        )
    )
    assert window.shape == (10, 9)
    # targets stay near the circle
    d = np.linalg.norm(window[-1, :2] - mid[:2])
    assert abs(d - 2.0) < 0.6


def test_straight_projection():
    s = refs.straight_init(jnp.zeros(3), jnp.array([1.0, 1.0, 0.0]))
    p = refs.straight_project(s, jnp.array([1.0, 0.0, 5.0]))
    np.testing.assert_allclose(np.asarray(p), [0.5, 0.5, 0.0], atol=1e-6)


def test_polynomial_reference():
    rng = np.random.RandomState(11)
    ref = refs.polynomial_reference(rng, np.array([0.0, 0.0, 3.0]))
    assert ref.shape[1] == 9
    np.testing.assert_allclose(ref[0, :3], [0, 0, 3.0], atol=1e-6)
    # hover padding: first 50 rows identical position
    np.testing.assert_allclose(ref[:50, :3], np.tile(ref[0, :3], (50, 1)), atol=1e-6)
    # spacing ~ dist_points between consecutive interior points
    seg = np.linalg.norm(np.diff(ref[60:-60, :3], axis=0), axis=1)
    assert np.median(seg) == pytest.approx(0.025, rel=0.2)


def test_analytic_windows_use_state_row_layout():
    """Regression: hover/straight/circle windows must emit state-layout rows
    [pos, att(=0), vel] — NOT the planner's raw [pos, vel, acc] rows.

    The controller featurizer reads columns 6:9 as velocity; the reference
    feeds it acceleration there (plan_trajectory.py:701-734 vs
    dataset.py:191-204), an upstream bug deliberately not reproduced —
    fixing it took flagship straight-line tracking from 0.29 err / 31
    stable steps to 0.036 err / full 251 steps with no retraining."""
    state = jnp.asarray(
        np.array([0.5, -0.2, 2.0, 0, 0, 0, 0.3, 0.1, -0.05, 0, 0, 0],
                 dtype=np.float32)
    )
    dt, horizon = 0.1, 10

    hover = np.asarray(
        refs.hover_ref_window(jnp.array([1.0, 1.0, 2.0]), state, dt, horizon)
    )
    s = refs.straight_init(jnp.zeros(3), jnp.array([1.0, 0.0, 0.0]))
    straight = np.asarray(
        refs.straight_ref_window(s, state, dt, horizon, 0.5)
    )
    c = refs.circle_init(
        state[:3], state[6:9], radius=2.0, direction=1.0, plane=(0, 1)
    )
    circle = np.asarray(
        refs.circle_ref_window(c, state, dt, horizon, 0.5, (0, 1))
    )

    for window in (hover, straight, circle):
        assert window.shape == (horizon, 9)
        # attitude slots are zero
        np.testing.assert_allclose(window[:, 3:6], 0.0)
        # velocity slots are consistent with the position rows
        # (finite difference of a quintic ~ its analytic derivative)
        # (an acceleration profile would not match the position rows'
        # finite difference; rows start at t=dt so no t=0 boundary check)
        fd_vel = np.gradient(window[:, :3], dt, axis=0)
        np.testing.assert_allclose(
            window[1:-1, 6:9], fd_vel[1:-1], atol=0.35
        )
