"""Differentiable quadrotor dynamics (Flightmare model + simplified model).

JAX re-implementation of the physics in
``neural_control/dynamics/quad_dynamics_flightmare.py:128-216`` (the model
used for all quad training/eval in the reference) and
``neural_control/dynamics/quad_dynamics_simple.py:68-104`` (the simplified
alternative).

State layout (12,): ``[pos(3), attitude euler(3), vel_world(3), body_rates(3)]``
Action layout (4,): normalized to [0, 1]:
    a0 -> total thrust  ``a0 * 15 - 7.5 + 9.81``  [m/s^2-equivalent]
    a1..a3 -> desired body rates ``a - 0.5`` [rad/s]

Everything is expressed component-wise so XLA fuses the whole step into a
handful of VPU ops — no tiny 3x3 matmuls in the hot path.
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.ops.rotations import euler_rate

# Defaults match neural_control/dynamics/config_quad.json
DEFAULT_QUAD_CFG = {
    "mass": 0.723,
    "arm_length": 0.31,
    "frame_inertia": [4.5, 4.5, 7.0],
    "gravity": [0.0, 0.0, -9.81],
    "kinv_ang_vel_tau": [16.6, 16.6, 5.0],
    "translational_drag": [0.0, 0.0, 0.0],
    "rotational_drag": [0.0, 0.0, 0.0],
}


class QuadParams(NamedTuple):
    """Quadrotor physical parameters as a differentiable pytree.

    ``inertia`` is the diagonal of the inertia tensor, derived as
    ``mass / 12 * arm_length^2 * frame_inertia``
    (quad_dynamics_base.py:32-35).
    """

    mass: jnp.ndarray
    inertia: jnp.ndarray  # (3,) diagonal of J
    kinv_ang_vel_tau: jnp.ndarray  # (3,) rate-loop inverse time constants
    gravity: jnp.ndarray  # (3,)
    translational_drag: jnp.ndarray  # (3,)
    rotational_drag: jnp.ndarray  # (3,)


def quad_params(modified_params=None) -> QuadParams:
    """Build quad params from defaults + mismatch overrides.

    ``modified_params`` accepts the same keys as the reference's
    ``modified_params`` dict (quad_dynamics_base.py:11-24): ``mass``,
    ``arm_length``, ``frame_inertia``, ``kinv_ang_vel_tau``,
    ``translational_drag``, ``rotational_drag``, ``gravity``.
    """
    cfg = dict(DEFAULT_QUAD_CFG)
    if modified_params:
        cfg.update(modified_params)
    inertia = (
        cfg["mass"] / 12.0 * cfg["arm_length"] ** 2
        * np.asarray(cfg["frame_inertia"], dtype=np.float64)
    )
    f32 = lambda v: jnp.asarray(v, dtype=jnp.float32)
    return QuadParams(
        mass=f32(cfg["mass"]),
        inertia=f32(inertia),
        kinv_ang_vel_tau=f32(cfg["kinv_ang_vel_tau"]),
        gravity=f32(cfg["gravity"]),
        translational_drag=f32(cfg["translational_drag"]),
        rotational_drag=f32(cfg["rotational_drag"]),
    )


def _rescale_action(action):
    """Normalized [0,1] action -> (total_thrust, body_rates).

    Mirrors quad_dynamics_flightmare.py:139-140.
    """
    total_thrust = action[..., 0] * 15.0 - 7.5 + 9.81
    body_rates = action[..., 1:4] - 0.5
    return total_thrust, body_rates


def _thrust_world_acc(params, attitude, total_thrust):
    """World-frame acceleration from body-z thrust + gravity + drag.

    Component-wise expansion of ``linear_dynamics``
    (quad_dynamics_flightmare.py:74-93): the body->world rotation applied to
    the body-z force vector reduces to the third column of R^T.
    """
    roll, pitch, yaw = attitude[..., 0], attitude[..., 1], attitude[..., 2]
    Cy, Sy = jnp.cos(yaw), jnp.sin(yaw)
    Cp, Sp = jnp.cos(pitch), jnp.sin(pitch)
    Cr, Sr = jnp.cos(roll), jnp.sin(roll)

    force = params.mass * total_thrust
    inv_m = 1.0 / params.mass
    acc_x = (Cy * Sp * Cr + Sr * Sy) * force * inv_m
    acc_y = (Cr * Sy * Sp - Cy * Sr) * force * inv_m
    acc_z = (Cr * Cp) * force * inv_m
    acc = jnp.stack([acc_x, acc_y, acc_z], axis=-1)
    return acc + params.gravity + params.translational_drag


def quad_step(params: QuadParams, state, action, dt):
    """One semi-implicit-Euler step of the Flightmare quadrotor model.

    Mirrors ``FlightmareDynamics.simulate_quadrotor``
    (quad_dynamics_flightmare.py:128-216):
      * low-level rate controller: body torque =
        J @ Kinv @ (rates_cmd - av) + av x (J av) + rot_drag
        (run_flight_control, lines 95-117);
      * angular acc = J^-1 (tau - av x (J av)) — the cross product cancels,
        leaving Kinv-damped rate tracking;
      * position integrates with the reference's exact quirk
        ``pos + 0.5 dt^2 acc + 0.5 dt vel`` (line 172-174 — note the 0.5 on
        the velocity term);
      * attitude integrates euler_rate with the OLD angular velocity
        (line 210).

    Args:
        params: QuadParams pytree.
        state: (..., 12).
        action: (..., 4) in [0, 1].
        dt: python float.
    Returns:
        (..., 12) next state.
    """
    position = state[..., 0:3]
    attitude = state[..., 3:6]
    velocity = state[..., 6:9]
    av = state[..., 9:12]

    total_thrust, body_rates = _rescale_action(action)

    # angular dynamics: tau - cross cancels to J * Kinv * (cmd - av) + drag
    body_torque_minus_cross = (
        params.inertia * (params.kinv_ang_vel_tau * (body_rates - av))
        + params.rotational_drag
    )
    angular_acc = body_torque_minus_cross / params.inertia

    acceleration = _thrust_world_acc(params, attitude, total_thrust)

    new_position = position + 0.5 * dt * dt * acceleration + 0.5 * dt * velocity
    new_velocity = velocity + dt * acceleration
    new_av = av + dt * angular_acc
    new_attitude = attitude + dt * euler_rate(attitude, av)

    return jnp.concatenate(
        [new_position, new_attitude, new_velocity, new_av], axis=-1
    )


def quad_step_fast(params: QuadParams, state, action, dt):
    """Algebraically pre-combined ``quad_step`` — same model, shorter
    dependent elementwise chain (the VPU-issue-bound resource at the
    headline batch, DESIGN.md 2).

    Identical math to :func:`quad_step` with the constant chains folded:

      * the rate loop's ``J * Kinv * (cmd - av) / J`` multiply-then-divide
        cancels to ``Kinv * (cmd - av)`` (the torch reference computes the
        torque then divides it back out, quad_dynamics_flightmare.py:
        100-117 + 156-160 — J cancels exactly);
      * ``dt`` folds into the rate gain: ``new_av = av + (dt*Kinv) *
        (cmd - av) + dt*rot_drag/J`` — two fewer dependent ops;
      * the thrust force's ``mass * thrust ... / mass`` cancels to
        ``thrust`` (linear_dynamics, lines 74-93 — mass cancels exactly);
      * gravity + translational drag pre-sum into one constant vector.

    Deviation from quad_step is float-roundoff only (~1 ulp per step; the
    a*x/a chains are not value-changing algebra). Parity tests pin
    quad_step bit-exactly against the reference; this variant is the
    throughput path and is pinned to quad_step within 1e-5.
    """
    position = state[..., 0:3]
    attitude = state[..., 3:6]
    velocity = state[..., 6:9]
    av = state[..., 9:12]

    total_thrust = action[..., 0] * 15.0 + 2.31  # = *15 - 7.5 + 9.81
    body_rates = action[..., 1:4] - 0.5

    # params-only constants: folded once per step call, hoisted out of any
    # surrounding scan by XLA loop-invariant code motion
    dt_kinv = dt * params.kinv_ang_vel_tau
    dt_drag_over_J = dt * params.rotational_drag / params.inertia
    g_plus_drag = params.gravity + params.translational_drag

    new_av = av + dt_kinv * (body_rates - av) + dt_drag_over_J

    roll, pitch, yaw = attitude[..., 0], attitude[..., 1], attitude[..., 2]
    Cy, Sy = jnp.cos(yaw), jnp.sin(yaw)
    Cp, Sp = jnp.cos(pitch), jnp.sin(pitch)
    Cr, Sr = jnp.cos(roll), jnp.sin(roll)
    acc = jnp.stack([
        (Cy * Sp * Cr + Sr * Sy) * total_thrust,
        (Cr * Sy * Sp - Cy * Sr) * total_thrust,
        (Cr * Cp) * total_thrust,
    ], axis=-1) + g_plus_drag

    new_position = (
        position + (0.5 * dt * dt) * acc + (0.5 * dt) * velocity
    )
    new_velocity = velocity + dt * acc

    # euler_rate inline, sharing the trig above (XLA would CSE anyway;
    # inlining keeps the whole step one fusion candidate)
    p, q, r = av[..., 0], av[..., 1], av[..., 2]
    new_attitude = attitude + dt * jnp.stack([
        p - Sp * r,
        Cr * q + Cp * Sr * r,
        -Sr * q + Cp * Cr * r,
    ], axis=-1)

    return jnp.concatenate(
        [new_position, new_attitude, new_velocity, new_av], axis=-1
    )


def quad_step_simple(params: QuadParams, state, action, dt):
    """One step of the simplified quad model.

    Mirrors ``SimpleDynamics.simulate_quadrotor``
    (quad_dynamics_simple.py:68-104). Differences to the Flightmare model:
      * thrust acceleration does NOT divide by mass (the squared-rotor-speed
        convention, line 28-30 uses 1/m * thrust_cmd directly where
        thrust_cmd is already an acceleration) — i.e. acc = R^T e_z *
        total_thrust / mass;
      * angular acc = (J Kinv (cmd - av) + av x (J av)) / J — the cross
        product does NOT cancel here;
      * attitude integrates euler_rate with the NEW angular velocity
        (line 101).
    """
    position = state[..., 0:3]
    attitude = state[..., 3:6]
    velocity = state[..., 6:9]
    av = state[..., 9:12]

    total_thrust, body_rates = _rescale_action(action)

    roll, pitch, yaw = attitude[..., 0], attitude[..., 1], attitude[..., 2]
    Cy, Sy = jnp.cos(yaw), jnp.sin(yaw)
    Cp, Sp = jnp.cos(pitch), jnp.sin(pitch)
    Cr, Sr = jnp.cos(roll), jnp.sin(roll)
    inv_m = 1.0 / params.mass
    acc_x = (Cy * Sp * Cr + Sr * Sy) * total_thrust * inv_m
    acc_y = (Cr * Sy * Sp - Cy * Sr) * total_thrust * inv_m
    acc_z = (Cr * Cp) * total_thrust * inv_m
    acceleration = (
        jnp.stack([acc_x, acc_y, acc_z], axis=-1) + params.gravity
    )

    inertia_av = params.inertia * av
    cross = jnp.cross(av, inertia_av)
    ang_momentum = params.inertia * (
        params.kinv_ang_vel_tau * (body_rates - av)
    ) + cross
    angular_acc = ang_momentum / params.inertia

    new_position = position + 0.5 * dt * dt * acceleration + 0.5 * dt * velocity
    new_velocity = velocity + dt * acceleration
    new_av = av + dt * angular_acc
    new_attitude = attitude + dt * euler_rate(attitude, new_av)

    return jnp.concatenate(
        [new_position, new_attitude, new_velocity, new_av], axis=-1
    )


def quad_is_stable(state, thresh=0.4):
    """Stability predicate: |roll|, |pitch| < thresh.

    Mirrors ``QuadRotorEnvBase.get_is_stable`` (drone_env.py:66-74), as a
    vectorized mask for use inside jitted rollouts.
    """
    return jnp.all(jnp.abs(state[..., 3:5]) < thresh, axis=-1)


# ---------------------------------------------------------------------------
# quaternion point-mass model ("high_mpc")
# ---------------------------------------------------------------------------

_GZ = 9.81


def _quad_high_deriv(state, action):
    """State derivative of the 10-state quaternion model
    (get_dynamics_high_mpc, mpc.py:473-512): state = [pos(3), quat wxyz(4),
    vel(3)], action = [collective thrust (m/s^2), body rates (rad/s)]."""
    qw, qx, qy, qz = (
        state[..., 3], state[..., 4], state[..., 5], state[..., 6]
    )
    thrust, wx, wy, wz = (
        action[..., 0], action[..., 1], action[..., 2], action[..., 3]
    )
    return jnp.stack(
        [
            state[..., 7],
            state[..., 8],
            state[..., 9],
            0.5 * (-wx * qx - wy * qy - wz * qz),
            0.5 * (wx * qw + wz * qy - wy * qz),
            0.5 * (wy * qw - wz * qx + wx * qz),
            0.5 * (wz * qw + wy * qx - wx * qy),
            2 * (qw * qy + qx * qz) * thrust,
            2 * (qy * qz - qw * qx) * thrust,
            (qw * qw - qx * qx - qy * qy + qz * qz) * thrust - _GZ,
        ],
        axis=-1,
    )


def quad_step_high(params, state, action, dt, refinement=4):
    """RK4 step of the quaternion model with ``refinement`` substeps
    (drone_dynamics_high_mpc, mpc.py:451-471). ``params`` is unused (the
    model is parameter-free beyond gravity) but kept for the shared
    ``step(params, state, action, dt)`` calling convention."""
    del params
    h = dt / refinement
    for _ in range(refinement):
        k1 = h * _quad_high_deriv(state, action)
        k2 = h * _quad_high_deriv(state + 0.5 * k1, action)
        k3 = h * _quad_high_deriv(state + 0.5 * k2, action)
        k4 = h * _quad_high_deriv(state + k3, action)
        state = state + (k1 + 2 * k2 + 2 * k3 + k4) / 6.0
    return state
