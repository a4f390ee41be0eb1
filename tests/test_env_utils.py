"""Direct unit tests for modules previously exercised only indirectly:
quad env resets + data sampler, predefined waypoint sets, debug hooks."""

import glob

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from apg_trajectory_tracking_tpu.envs.quad_env import (
    full_state_training_data,
    quad_random_reset,
    quad_zero_reset,
)
from apg_trajectory_tracking_tpu.trajectory.predefined import (
    collected_trajectories,
)
from apg_trajectory_tracking_tpu.utils.debug import (
    Timer,
    enable_nan_debugging,
    trace,
)


def test_quad_zero_reset():
    s = quad_zero_reset(4, position=(1.0, 2.0, 3.0))
    assert s.shape == (4, 12) and s.dtype == jnp.float32
    np.testing.assert_allclose(s[:, :3], [[1.0, 2.0, 3.0]] * 4)
    np.testing.assert_allclose(s[:, 3:], 0.0)


def test_quad_random_reset_bounds():
    """drone_env.py:151-172: small roll/pitch, yaw in +-1.5, pos in
    [-1,1]^3, vel in +-3, ang vel in +-2*strength with yaw rate halved."""
    s = np.asarray(quad_random_reset(jax.random.PRNGKey(0), 256,
                                     strength=0.8))
    mpr = 3.0 * 0.8 * np.pi / 180.0
    assert np.all(np.abs(s[:, 3:5]) <= mpr)  # roll/pitch
    assert np.all(np.abs(s[:, 5]) <= 1.5)  # yaw
    assert np.all(np.abs(s[:, 0:3]) <= 1.0)
    assert np.all(np.abs(s[:, 6:9]) <= 3.0)
    assert np.all(np.abs(s[:, 9:11]) <= 1.6)
    assert np.all(np.abs(s[:, 11]) <= 0.8)  # yaw rate halved
    # actually random (not degenerate)
    assert s[:, 0].std() > 0.1


def test_full_state_training_data(tiny_bank):
    from apg_trajectory_tracking_tpu.trajectory.generate import (
        load_trajectory_bank,
    )

    bank = load_trajectory_bank(tiny_bank, "train")
    rng = np.random.RandomState(0)
    states, refs = full_state_training_data(
        rng, bank, 32, ref_length=10, dt=0.1, speed_factor=0.4
    )
    assert states.shape == (32, 12) and refs.shape == (32, 10, 9)
    assert states.dtype == np.float32 and refs.dtype == np.float32
    # angular velocity zeroed on the sampled drone states (drone_env.py:258)
    np.testing.assert_allclose(states[:, 9:12], 0.0)
    # the reference window starts right after the state: at dt=0.1 and
    # speed 0.4 consecutive positions move < 1 m
    gap0 = np.linalg.norm(refs[:, 0, :3] - states[:, :3], axis=1)
    steps = np.linalg.norm(np.diff(refs[..., :3], axis=1), axis=2)
    assert gap0.max() < 1.0
    assert steps.max() < 1.0
    assert np.all(np.isfinite(refs))


def test_predefined_waypoint_sets():
    """The four reference waypoint sets (predefined_trajectories.py:5-49)."""
    assert set(collected_trajectories) == {
        "eight", "curve", "flat_eight", "sinus"
    }
    for name, pts in collected_trajectories.items():
        assert pts.ndim == 2 and pts.shape[1] == 3, name
        assert pts.shape[0] >= 5, name
        assert np.all(np.isfinite(pts)), name
    # flat_eight is flat: z identically zero
    np.testing.assert_allclose(
        collected_trajectories["flat_eight"][:, 2], 0.0
    )
    # sinus runs along y only
    np.testing.assert_allclose(collected_trajectories["sinus"][:, 0], 0.0)


def test_timer_throughput():
    t = Timer()
    assert t.elapsed() >= 0.0
    assert t.throughput(1000) > 0.0
    t.reset()
    assert t.elapsed() < 1.0


def test_enable_nan_debugging_raises_and_restores():
    enable_nan_debugging(True)
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0)).block_until_ready()
    finally:
        enable_nan_debugging(False)
    # off again: NaN flows through silently
    out = jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0))
    assert np.isnan(np.asarray(out))


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d) as log_dir:
        jnp.ones(16).sum().block_until_ready()
    assert log_dir == d
    assert glob.glob(d + "/plugins/profile/*/*.xplane.pb")
