"""Closed-form minimum-jerk reference generation (Mueller's rapid
quadrocopter trajectories), fully vectorized for use inside jitted eval
loops.

Re-designs ``neural_control/trajectory/plan_trajectory.py`` (the
``SingleAxisTrajectory``/``RapidTrajectory`` classes and ``get_reference``,
lines 36-133 and 701-734): with position, velocity, and acceleration all
constrained at both ends, the jerk-optimal quintic has closed-form
coefficients — no classes, no loops, a few fused VPU ops. Batched via
``vmap`` for free.
"""

import jax.numpy as jnp


def min_jerk_reference(pos0, vel0, acc0, posf, velf, dt, horizon):
    """Reference trajectory of (pos, vel, acc) over ``horizon`` steps.

    Matches ``get_reference`` (plan_trajectory.py:701-734): goal acceleration
    zero, total duration Tf = dt * horizon, sampled at t = dt..horizon*dt
    (the current state at t=0 is excluded).

    Args:
        pos0, vel0, acc0: (..., 3) current state.
        posf, velf: (..., 3) goal position/velocity.
        dt: python float.
        horizon: python int.
    Returns:
        (..., horizon, 9) array of [pos, vel, acc] rows.
    """
    Tf = dt * horizon
    T2, T3, T4, T5 = Tf * Tf, Tf**3, Tf**4, Tf**5

    delta_a = -acc0  # accf = 0
    delta_v = velf - vel0 - acc0 * Tf
    delta_p = posf - pos0 - vel0 * Tf - 0.5 * acc0 * T2

    # fully-constrained case (plan_trajectory.py:90-99)
    alpha = (60 * T2 * delta_a - 360 * Tf * delta_v + 720 * delta_p) / T5
    beta = (-24 * T3 * delta_a + 168 * T2 * delta_v - 360 * Tf * delta_p) / T5
    gamma = (3 * T4 * delta_a - 24 * T3 * delta_v + 60 * T2 * delta_p) / T5

    # sample times dt..horizon*dt; broadcast over trailing (3,) axis
    t = (jnp.arange(1, horizon + 1, dtype=jnp.float32) * dt)[:, None]
    # add a broadcast axis for the horizon between batch dims and xyz
    p0, v0, a0 = pos0[..., None, :], vel0[..., None, :], acc0[..., None, :]
    al, be, ga = alpha[..., None, :], beta[..., None, :], gamma[..., None, :]

    t2, t3, t4, t5 = t * t, t**3, t**4, t**5
    pos = (
        p0 + v0 * t + 0.5 * a0 * t2
        + ga / 6.0 * t3 + be / 24.0 * t4 + al / 120.0 * t5
    )
    vel = v0 + a0 * t + 0.5 * ga * t2 + be / 6.0 * t3 + al / 24.0 * t4
    acc = a0 + ga * t + 0.5 * be * t2 + al / 6.0 * t3
    return jnp.concatenate([pos, vel, acc], axis=-1)


def linear_reference(pos0, vel0, posf, velf, horizon):
    """Linear interpolation variant (plan_trajectory.py:688-699).

    Returns (..., horizon, 9) with zero acceleration columns.
    """
    i = jnp.arange(1, horizon + 1, dtype=jnp.float32)[:, None]
    pos_vec = (posf - pos0) / horizon
    vel_vec = (velf - vel0) / horizon
    pos = pos0[..., None, :] + i * pos_vec[..., None, :]
    vel = vel0[..., None, :] + i * vel_vec[..., None, :]
    return jnp.concatenate([pos, vel, jnp.zeros_like(pos)], axis=-1)
