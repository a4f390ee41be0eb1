"""MPC-cost-aligned differentiable tracking losses.

JAX re-implementation of ``neural_control/drone_loss.py`` with identical
weights and reductions (sums over batch, horizon, and dims — not means), so
loss curves are directly comparable to the reference.
"""

import jax.numpy as jnp

# action priors: hover thrust / zero body rates are 0.5 after normalization
_RATES_PRIOR = jnp.array([0.5, 0.5, 0.5], dtype=jnp.float32)

# per-state-dim weights for the cartpole MPC loss (drone_loss.py:136)
_CARTPOLE_WEIGHTS = jnp.array([0.0, 3.0, 10.0, 1.0], dtype=jnp.float32)


def quad_mpc_loss(states, ref_states, action_seq):
    """Quadrotor k-step tracking loss (drone_loss.py:12-39).

    Weights mirror the MPC cost matrices: pos 10, vel 1, thrust-reg 5,
    rate-reg 0.1, angular-velocity 0.1.

    Args:
        states: (B, k, 12) unrolled states.
        ref_states: (B, k, >=9) reference (pos at [:3], vel at [6:9]).
        action_seq: (B, k, 4) normalized actions.
    Returns:
        scalar loss (sum-reduced).
    """
    position_loss = jnp.sum((states[:, :, :3] - ref_states[:, :, :3]) ** 2)
    velocity_loss = jnp.sum((states[:, :, 6:9] - ref_states[:, :, 6:9]) ** 2)
    av_loss = jnp.sum(states[:, :, 9:12] ** 2)
    u_thrust_loss = jnp.sum((action_seq[:, :, 0] - 0.5) ** 2)
    u_rates_loss = jnp.sum((action_seq[:, :, 1:] - _RATES_PRIOR) ** 2)
    return (
        10.0 * position_loss
        + 1.0 * velocity_loss
        + 0.1 * av_loss
        + 0.1 * u_rates_loss
        + 5.0 * u_thrust_loss
    )


def quad_loss_last(states, last_ref_state, action_seq):
    """Final-state quadrotor loss variant (drone_loss.py:42-66)."""
    action_loss = jnp.sum((action_seq[:, :, 0] - 0.5) ** 2)
    position_loss = jnp.sum((states[:, -1, :3] - last_ref_state[:, :3]) ** 2)
    velocity_loss = jnp.sum((states[:, -1, 6:9] - last_ref_state[:, 6:9]) ** 2)
    ang_vel_error = jnp.sum(states[:, :, 9:11] ** 2) + 10.0 * jnp.sum(
        states[:, :, 11] ** 2
    )
    return (
        2e-2 * ang_vel_error
        + 10.0 * position_loss
        + 0.1 * velocity_loss
        + 0.1 * action_loss
    )


def fixed_wing_mpc_loss(drone_states, linear_reference, action_seq):
    """Fixed-wing k-step tracking loss (drone_loss.py:72-82).

    pos 10, regularization of the 3 surface actions toward 0.5 with 0.1.
    """
    action_loss = jnp.sum((action_seq[:, :, 1:] - _RATES_PRIOR) ** 2)
    pos_loss = jnp.sum((drone_states[:, :, :3] - linear_reference) ** 2)
    return 10.0 * pos_loss + 0.1 * action_loss


def fixed_wing_last_loss(drone_states, linear_reference):
    """Final-position fixed-wing loss (drone_loss.py:85-102)."""
    return jnp.sum((drone_states[:, :3] - linear_reference) ** 2)


def cartpole_loss_mpc(states, ref_states, actions):
    """Cartpole MPC-style loss (drone_loss.py:139-145).

    Per-dim weights [0, 3, 10, 1] + 0.01 * sum(actions^2).
    """
    loss = (states - ref_states) ** 2 * _CARTPOLE_WEIGHTS
    loss_actions = jnp.sum(actions**2)
    return jnp.sum(loss) + 0.01 * loss_actions


def cartpole_loss_balance(state):
    """Balance loss on final states (drone_loss.py:148-154)."""
    abs_state = jnp.abs(state)
    angle_loss = 3.0 * abs_state[:, 2]
    angle_vel_loss = 0.1 * abs_state[:, 3] * (jnp.pi - abs_state[:, 2]) ** 2
    return jnp.sum(0.1 * (angle_loss + angle_vel_loss))


def cartpole_loss_swingup(state):
    """Swing-up loss on final states (drone_loss.py:157-177)."""
    abs_state = jnp.abs(state)
    pos_loss = state[:, 0] ** 2
    vel_loss = abs_state[:, 1] * (2.4 - abs_state[:, 0]) ** 2
    angle_loss = 3.0 * abs_state[:, 2]
    angle_vel_loss = 0.1 * abs_state[:, 3] * (jnp.pi - abs_state[:, 2]) ** 2
    return jnp.sum(0.1 * (pos_loss + vel_loss + angle_loss + angle_vel_loss))
