"""Cartpole environment functions: resets, predicates, and the training-data
sampler — all batched.

Re-designs ``neural_control/environments/cartpole_env.py``: the stateful
single-instance gym env becomes pure reset/step/predicate functions over
batched state arrays; ``construct_states`` (lines 178-236) becomes two
vectorized rollout sweeps (vmap over environments, scan over time) instead
of a python while-loop over a single env.
"""

import jax
import jax.numpy as jnp
import numpy as np

from apg_trajectory_tracking_tpu.dynamics.cartpole import (
    cartpole_params,
    cartpole_step,
    wrap_theta,
)

# [x, x_dot, theta, theta_dot] sampling limits (cartpole_env.py:46)
STATE_LIMITS = np.array([2.4, 7.5, np.pi, 7.5], dtype=np.float32)


def is_upright(state, thresh_div=0.21):
    """|theta| < thresh (cartpole_env.py:53-55), batched."""
    return jnp.abs(state[..., 2]) < thresh_div


def reset_random(key, batch):
    """Uniform random states within limits (cartpole_env.py:84-93)."""
    u = jax.random.uniform(key, (batch, 4), minval=-1.0, maxval=1.0)
    return u * STATE_LIMITS


def reset_swingup(key, batch):
    """Hanging-down starts (cartpole_env.py:95-105): x=0, small velocities,
    |theta| in [2.8, 3.1] with random sign."""
    k1, k2, k3 = jax.random.split(key, 3)
    state = reset_random(k1, batch)
    state = state.at[:, 0].set(0.0)
    state = state.at[:, 1].mul(0.1)
    state = state.at[:, 3].mul(0.1)
    sign = jnp.where(jax.random.uniform(k2, (batch,)) > 0.5, -1.0, 1.0)
    theta = sign * (2.8 + jax.random.uniform(k3, (batch,)) * 0.3)
    return state.at[:, 2].set(theta)


def reset_upright(key, batch):
    """Near-upright starts (cartpole_env.py:107-115)."""
    k1, k2 = jax.random.split(key)
    state = (jax.random.uniform(k1, (batch, 4)) - 0.5) * 0.3
    theta = (jax.random.uniform(k2, (batch,)) - 0.5) * 0.1
    return state.at[:, 2].set(theta)


def env_step(params, state, action, dt):
    """Dynamics step + theta wrapping (cartpole_env.py:57-82)."""
    return wrap_theta(cartpole_step(params, state, action, dt))


def construct_states(key, num_data, dt, thresh_div=0.21, params=None):
    """Vectorized training-state sampler (cartpole_env.py:178-236).

    80% of states come from 20-step rollouts with small random actions from
    random starts (velocities damped x0.2); the remaining 20% from
    balancing rollouts near upright with moderate random actions, keeping
    only the steps where the pole is still upright.

    Returns (num_data, 4) float32 states (device array).
    """
    if params is None:
        params = cartpole_params()
    n_random = int(num_data * 0.8)
    n_balance = num_data - n_random

    k1, k2, k3, k4 = jax.random.split(key, 4)

    # --- randomized 20-step runs -----------------------------------------
    n_runs = -(-n_random // 20)  # ceil
    start = reset_random(k1, n_runs)
    start = start.at[:, 1].mul(0.2).at[:, 3].mul(0.2)
    actions = (jax.random.uniform(k2, (20, n_runs, 1)) - 0.5) * 0.2

    def roll(state, act):
        nxt = env_step(params, state, act, dt)
        return nxt, nxt

    _, rand_states = jax.lax.scan(roll, start, actions)
    rand_states = rand_states.reshape(-1, 4)[:n_random]

    # --- balancing runs near upright --------------------------------------
    # fixed-length scan with an upright mask standing in for the while-loop
    max_len = 40
    n_bal_runs = -(-n_balance // 8)  # assume ~8 upright steps per run
    bal_start = (jax.random.uniform(k3, (n_bal_runs, 4)) - 0.5) * 0.1
    bal_actions = jax.random.uniform(
        k4, (max_len, n_bal_runs, 1), minval=-0.5, maxval=0.5
    )

    def roll_masked(carry, act):
        state, alive = carry
        nxt = env_step(params, state, act, dt)
        alive = jnp.logical_and(alive, is_upright(state, thresh_div))
        return (nxt, alive), (nxt, alive)

    (_, _), (bal_states, bal_mask) = jax.lax.scan(
        roll_masked,
        (bal_start, jnp.ones(n_bal_runs, dtype=bool)),
        bal_actions,
    )
    bal_states = bal_states.reshape(-1, 4)
    bal_mask = bal_mask.reshape(-1)
    # stable partition: upright steps first, pad by wrapping
    order = jnp.argsort(~bal_mask, stable=True)
    bal_states = bal_states[order][:n_balance]

    return jnp.concatenate([rand_states, bal_states], axis=0)
