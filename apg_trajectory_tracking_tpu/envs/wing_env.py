"""Fixed-wing environment functions and the exploration data sampler.

Re-designs ``neural_control/environments/wing_env.py``: ``run_wing_flight``
(lines 72-95) becomes a batched masked scan (many flights in lockstep,
instability ends a flight via mask instead of ``break``);
``sample_training_data`` (112-162) pairs sampled states with future
positions from the same flight.
"""

import numpy as np
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.dynamics.fixed_wing import (
    wing_params,
    wing_step,
    wing_is_stable,
)

ACTION_PRIOR = np.array([0.25, 0.5, 0.5, 0.5], dtype=np.float32)


def wing_zero_reset(batch=1):
    """Level flight at u = 11.5 m/s (wing_env.py:26-28)."""
    state = jnp.zeros((batch, 12), dtype=jnp.float32)
    return state.at[:, 3].set(11.5)


def run_wing_flight(
    key, n_flights=10, traj_len=500, dt=0.01, params=None, thresh_stable=0.7
):
    """Fly ``n_flights`` random-action trajectories in lockstep.

    Mirrors ``run_wing_flight`` (wing_env.py:72-95): a new action is drawn
    every 10 steps as N(0, 0.15) around the prior [.25,.5,.5,.5], clipped to
    [0,1]; a flight 'ends' (mask goes false) once |roll| or |pitch| exceeds
    the threshold.

    Returns:
        states: (traj_len, n_flights, 12) float32
        alive: (traj_len, n_flights) bool — state was recorded before
               instability.
    """
    if params is None:
        params = wing_params()
    n_blocks = -(-traj_len // 10)
    noise = jax.random.normal(key, (n_blocks, n_flights, 4)) * 0.15
    actions_blocks = jnp.clip(noise + ACTION_PRIOR, 0.0, 1.0)
    actions = jnp.repeat(actions_blocks, 10, axis=0)[:traj_len]

    def body(carry, act):
        state, alive = carry
        new_state = wing_step(params, state, act, dt)
        stable = wing_is_stable(new_state, thresh_stable)
        alive_now = jnp.logical_and(alive, stable)
        return (new_state, alive_now), (new_state, alive_now)

    init = (wing_zero_reset(n_flights), jnp.ones(n_flights, dtype=bool))
    _, (states, alive) = jax.lax.scan(body, init, actions)
    return states, alive


def sample_training_data(
    rng,
    num_samples,
    dt=0.01,
    take_every=10,
    traj_len=500,
    use_at_each=20,
    params=None,
    **_unused,
):
    """(state, future-position target) pairs from random flights.

    Mirrors ``sample_training_data`` (wing_env.py:112-162): sample every
    ``take_every``-th state of each flight (with jitter), and pair it with
    ``use_at_each`` random future positions at least 10 steps ahead.

    Returns:
        (states (num_samples, 12), refs (num_samples, 3)) float32 numpy.
    """
    states_out, refs_out = [], []
    seed = rng.randint(2**31)
    key = jax.random.PRNGKey(seed)
    while len(refs_out) < num_samples:
        key, sub = jax.random.split(key)
        traj_batch, alive_batch = run_wing_flight(
            sub, n_flights=8, traj_len=traj_len, dt=dt, params=params
        )
        traj_batch = np.asarray(traj_batch)
        alive_batch = np.asarray(alive_batch)
        for f in range(traj_batch.shape[1]):
            traj = traj_batch[alive_batch[:, f], f]
            curr_len = len(traj)
            if curr_len < 20:
                continue
            n_start = curr_len // take_every
            for i in range(n_start):
                curr_ind = int(i * take_every + rng.rand() * 5)
                if curr_ind + 10 >= curr_len:
                    continue
                future = rng.permutation(
                    np.arange(curr_ind + 10, curr_len)
                )[:use_at_each]
                for fidx in future:
                    states_out.append(traj[curr_ind])
                    refs_out.append(traj[fidx, :3])
            if len(refs_out) >= num_samples:
                break
    return (
        np.array(states_out[:num_samples], dtype=np.float32),
        np.array(refs_out[:num_samples], dtype=np.float32),
    )
