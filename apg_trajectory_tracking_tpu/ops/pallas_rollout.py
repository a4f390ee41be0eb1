"""Pallas TPU kernel: fused k-step quadrotor rollout.

The APG hot loop is k sequential dynamics steps over a large env batch.
XLA compiles the ``lax.scan`` version into an on-chip loop already; this
kernel fuses the entire horizon into ONE Pallas program per batch block —
state never leaves VMEM between steps, and the per-step elementwise chains
(trig, rotation components, integration) execute back-to-back on the VPU.

Use :func:`benchmark_rollout` to compare against the XLA scan on the target
chip. Measured on TPU v5e at batch 4096, horizon 10: pallas 544us vs XLA
scan 306us — the 12-wide state occupies only 12 of 128 VPU lanes per block
and the column slicing is strided, so XLA's fused scan wins, exactly as
SURVEY.md §7 predicted ("the win is batching, not custom kernels"). The
evaluators/trainers therefore stay on the XLA path; this kernel remains as
a validated, opt-in experiment and a template for future fused ops.

Layout: states (B, 12) and actions (B, k*4) blocks in VMEM; the horizon
loop is unrolled at trace time (k is small and static).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from apg_trajectory_tracking_tpu.dynamics.quad import QuadParams, quad_step

BLOCK_B = 512


def _quad_step_block(state, action, dt, kinv, gravity_z, trans_drag,
                     rot_drag_over_inertia):
    """One quad step on a (block, 12) state with (block, 4) actions.

    Same math as dynamics/quad.py::quad_step, written column-wise with the
    physical parameters as python-scalar compile-time constants (Pallas
    kernels cannot capture array constants).
    """
    position = state[:, 0:3]
    attitude = state[:, 3:6]
    velocity = state[:, 6:9]
    av = state[:, 9:12]

    total_thrust = action[:, 0] * 15.0 - 7.5 + 9.81
    # angular acceleration per axis: kinv_i * (cmd_i - av_i) + drag_i/J_i
    ang_acc_cols = [
        kinv[i] * ((action[:, 1 + i] - 0.5) - av[:, i])
        + rot_drag_over_inertia[i]
        for i in range(3)
    ]
    angular_acc = jnp.stack(ang_acc_cols, axis=1)

    roll, pitch, yaw = attitude[:, 0], attitude[:, 1], attitude[:, 2]
    Cy, Sy = jnp.cos(yaw), jnp.sin(yaw)
    Cp, Sp = jnp.cos(pitch), jnp.sin(pitch)
    Cr, Sr = jnp.cos(roll), jnp.sin(roll)
    acc_x = (Cy * Sp * Cr + Sr * Sy) * total_thrust + trans_drag[0]
    acc_y = (Cr * Sy * Sp - Cy * Sr) * total_thrust + trans_drag[1]
    acc_z = (Cr * Cp) * total_thrust + gravity_z + trans_drag[2]
    acc = jnp.stack([acc_x, acc_y, acc_z], axis=1)

    new_position = position + 0.5 * dt * dt * acc + 0.5 * dt * velocity
    new_velocity = velocity + dt * acc

    p, q, r = av[:, 0], av[:, 1], av[:, 2]
    rate_roll = p - Sp * r
    rate_pitch = Cr * q + Cp * Sr * r
    rate_yaw = -Sr * q + Cp * Cr * r
    new_attitude = attitude + dt * jnp.stack(
        [rate_roll, rate_pitch, rate_yaw], axis=1
    )
    new_av = av + dt * angular_acc
    return jnp.concatenate(
        [new_position, new_attitude, new_velocity, new_av], axis=1
    )


def _rollout_kernel(horizon, dt, params_tuple, state_ref, actions_ref,
                    out_ref):
    kinv, gravity_z, trans_drag, rot_drag_over_inertia = params_tuple
    state = state_ref[:]
    for k in range(horizon):
        action = actions_ref[:, k * 4:(k + 1) * 4]
        state = _quad_step_block(
            state, action, dt, kinv, gravity_z, trans_drag,
            rot_drag_over_inertia,
        )
        out_ref[:, k * 12:(k + 1) * 12] = state


def make_quad_rollout_pallas(params: QuadParams, horizon, dt):
    """Build the fused-rollout fn with the (tiny) physical params baked in
    as compile-time constants. Returns f(states (B,12), actions
    (B,horizon,4)) -> (B, horizon, 12); B must be a multiple of BLOCK_B."""
    inertia = [float(x) for x in params.inertia]
    params_scalars = (
        tuple(float(x) for x in params.kinv_ang_vel_tau),
        float(params.gravity[2]),
        tuple(float(x) for x in params.translational_drag),
        tuple(
            float(d) / j
            for d, j in zip(params.rotational_drag, inertia)
        ),
    )
    kernel = functools.partial(_rollout_kernel, horizon, dt, params_scalars)

    @jax.jit
    def rollout(states, actions):
        B = states.shape[0]
        assert B % BLOCK_B == 0, f"batch {B} not a multiple of {BLOCK_B}"
        actions_flat = actions.reshape(B, horizon * 4)
        out = pl.pallas_call(
            kernel,
            grid=(B // BLOCK_B,),
            in_specs=[
                pl.BlockSpec((BLOCK_B, 12), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_B, horizon * 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLOCK_B, horizon * 12), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, horizon * 12), jnp.float32),
        )(states, actions_flat)
        return out.reshape(B, horizon, 12)

    return rollout


@functools.partial(jax.jit, static_argnames=("horizon", "dt"))
def quad_rollout_scan(params: QuadParams, states, actions, horizon, dt):
    """XLA reference path: lax.scan over the horizon."""

    def body(state, act):
        nxt = quad_step(params, state, act, dt)
        return nxt, nxt

    _, inter = jax.lax.scan(body, states, jnp.swapaxes(actions, 0, 1))
    return jnp.swapaxes(inter, 0, 1)


def benchmark_rollout(batch=4096, horizon=10, dt=0.1, iters=100):
    """Time both paths on the current backend; returns (pallas_s, scan_s)."""
    import time

    import numpy as np

    from apg_trajectory_tracking_tpu.dynamics.quad import quad_params

    params = quad_params()
    rng = np.random.RandomState(0)
    states = jnp.asarray(rng.randn(batch, 12).astype(np.float32) * 0.3)
    actions = jnp.asarray(rng.rand(batch, horizon, 4).astype(np.float32))

    pallas_fn = make_quad_rollout_pallas(params, horizon, dt)
    scan_fn = lambda s, a: quad_rollout_scan(params, s, a, horizon, dt)

    results = {}
    for name, fn in (("pallas", pallas_fn), ("scan", scan_fn)):
        out = fn(states, actions)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(states, actions)
        jax.block_until_ready(out)
        results[name] = (time.perf_counter() - t0) / iters
    return results
