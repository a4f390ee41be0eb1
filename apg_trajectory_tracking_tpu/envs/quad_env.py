"""Quadrotor environment functions and the trajectory-based data sampler.

Re-designs ``neural_control/environments/drone_env.py``: the gym env becomes
pure functions (reset / stability predicates live with the dynamics), and
``full_state_training_data`` (lines 232-269) samples (state, reference
window) pairs from the preloaded trajectory bank by strided slicing —
vectorized over whole trajectories.
"""

import numpy as np
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.trajectory.generate import prepare_trajectory

REF_SIZE = 9


def quad_zero_reset(batch, position=(0.0, 0.0, 3.0)):
    """Zero velocities/attitude at a given position (drone_env.py:129-142)."""
    state = jnp.zeros((batch, 12), dtype=jnp.float32)
    return state.at[:, 0:3].set(jnp.asarray(position, dtype=jnp.float32))


def quad_random_reset(key, batch, strength=0.8):
    """Randomized reset (drone_env.py:151-172): small roll/pitch, random yaw,
    position in [-1,1]^3, velocity in +-3, angular velocity in +-2*strength
    with yaw rate halved."""
    keys = jax.random.split(key, 5)
    mpr = 3.0 * strength * np.pi / 180.0
    roll_pitch = jax.random.uniform(
        keys[0], (batch, 2), minval=-mpr, maxval=mpr
    )
    yaw = jax.random.uniform(keys[1], (batch, 1), minval=-1.5, maxval=1.5)
    pos = jax.random.uniform(keys[2], (batch, 3)) * 2 - 1
    vel = jax.random.uniform(keys[3], (batch, 3), minval=-3.0, maxval=3.0)
    av = jax.random.uniform(
        keys[4], (batch, 3), minval=-2.0 * strength, maxval=2.0 * strength
    )
    av = av.at[:, 2].mul(0.5)
    return jnp.concatenate([pos, roll_pitch, yaw, vel, av], axis=1)


def full_state_training_data(
    rng,
    bank,
    len_data,
    ref_length=10,
    dt=0.1,
    speed_factor=0.6,
    **_unused,
):
    """Sample (drone state, reference window) training pairs.

    Mirrors ``full_state_training_data`` (drone_env.py:232-269): pick random
    trajectories from the bank, subsample by speed factor, take every
    ``2*ref_length``-th point as the drone state (angular velocity zeroed)
    and the following ``ref_length`` points as its reference.

    Host-side (numpy) — runs once per resample cadence, not per step.

    Args:
        rng: np.random.RandomState.
        bank: (N, T, 10) raw trajectory bank.
        len_data: number of pairs to produce.
    Returns:
        (states (len_data, 12), refs (len_data, ref_length, 9)) float32.
    """
    sample_freq = ref_length * 2
    states_out = np.zeros((len_data + 200, 12), dtype=np.float32)
    refs_out = np.zeros((len_data + 200, ref_length, REF_SIZE), dtype=np.float32)

    counter = 0
    while counter < len_data:
        traj = prepare_trajectory(
            bank[rng.randint(len(bank))], dt, speed_factor
        )[:, :REF_SIZE]
        traj_cut = traj[: -(ref_length + 1)]
        starts = traj_cut[::sample_freq]
        n_added = len(starts)

        states_out[counter:counter + n_added, :9] = starts
        # refs: rows i..i+ref_length for each start (vectorized gather)
        start_idx = np.arange(0, len(traj_cut), sample_freq)[:n_added]
        win = start_idx[:, None] + np.arange(1, ref_length + 1)[None, :]
        refs_out[counter:counter + n_added] = traj[win]
        counter += n_added

    return states_out[:len_data], refs_out[:len_data]
