#!/usr/bin/env python
"""Layout experiment: AoS (B,12) vs SoA 12x(B,) for the APG train step.

DESIGN.md section 2 established that at 64k envs the train step is bound by
VPU issue rate on 12-wide elementwise chains: a (B, 12) f32 array tiles the
12-long minor dim onto the 128-wide lane axis, so every fused elementwise op
uses at most 12/128 lanes (and (B, 3) slices use 3/128). This experiment
tests the obvious fix the round-1 pallas attempt did not: keep the SAME math
but carry the unrolled state as twelve (B,) vectors (structure-of-arrays) so
each op is batch-wide on the lanes, and accumulate the loss per step so no
(B, k, 12) intermediate is ever materialized. The featurization + controller
MLP stay in (B, F) layout (they are matmul-shaped); only the dynamics unroll
+ loss + their BPTT mirror change layout, with one (B,12)->12x(B,) unbind at
the boundary.

Prints a JSON line per batch size with both step times and the speedup, plus
a correctness check (loss + grad match to float tolerance).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from apg_trajectory_tracking_tpu.dynamics.quad import quad_params, quad_step
from apg_trajectory_tracking_tpu.data.dataset import quad_prepare_data
from apg_trajectory_tracking_tpu.models import (
    init_control_net,
    control_net_apply,
)
from apg_trajectory_tracking_tpu.training.common import sgd_momentum
from apg_trajectory_tracking_tpu.training.train_quad import (
    build_concurrent_step,
)

HORIZON = 10


def quad_step_soa(params, s, a, dt):
    """quad_step on a 12-tuple of (B,) state vectors + 4-tuple of actions.

    Identical math to dynamics/quad.py::quad_step, same op order, so the
    result bit-matches the AoS step.
    """
    (px, py, pz, roll, pitch, yaw, vx, vy, vz, avx, avy, avz) = s
    a0, a1, a2, a3 = a
    total_thrust = a0 * 15.0 - 7.5 + 9.81

    kinv = params.kinv_ang_vel_tau
    rdrag = params.rotational_drag
    inertia = params.inertia
    # angular acc per axis: kinv_i * (cmd_i - av_i) + drag_i / J_i
    aacc_x = (inertia[0] * (kinv[0] * ((a1 - 0.5) - avx)) + rdrag[0]) / inertia[0]
    aacc_y = (inertia[1] * (kinv[1] * ((a2 - 0.5) - avy)) + rdrag[1]) / inertia[1]
    aacc_z = (inertia[2] * (kinv[2] * ((a3 - 0.5) - avz)) + rdrag[2]) / inertia[2]

    Cy, Sy = jnp.cos(yaw), jnp.sin(yaw)
    Cp, Sp = jnp.cos(pitch), jnp.sin(pitch)
    Cr, Sr = jnp.cos(roll), jnp.sin(roll)
    force = params.mass * total_thrust
    inv_m = 1.0 / params.mass
    tdrag = params.translational_drag
    acc_x = (Cy * Sp * Cr + Sr * Sy) * force * inv_m + params.gravity[0] + tdrag[0]
    acc_y = (Cr * Sy * Sp - Cy * Sr) * force * inv_m + params.gravity[1] + tdrag[1]
    acc_z = (Cr * Cp) * force * inv_m + params.gravity[2] + tdrag[2]

    hdt2 = 0.5 * dt * dt
    npx = px + hdt2 * acc_x + 0.5 * dt * vx
    npy = py + hdt2 * acc_y + 0.5 * dt * vy
    npz = pz + hdt2 * acc_z + 0.5 * dt * vz
    nvx = vx + dt * acc_x
    nvy = vy + dt * acc_y
    nvz = vz + dt * acc_z
    navx = avx + dt * aacc_x
    navy = avy + dt * aacc_y
    navz = avz + dt * aacc_z
    # euler_rate with the OLD angular velocity (rotations.py::euler_rate)
    nroll = roll + dt * (avx - Sp * avz)
    npitch = pitch + dt * (Cr * avy + Cp * Sr * avz)
    nyaw = yaw + dt * (-Sr * avy + Cp * Cr * avz)
    return (npx, npy, npz, nroll, npitch, nyaw, nvx, nvy, nvz, navx, navy, navz)


def build_concurrent_step_soa(optimizer, dt, horizon):
    def loss_fn(net_params, dyn_params, states, refs):
        in_state, current_state, in_ref, rel_ref = quad_prepare_data(
            states, refs
        )
        logits = control_net_apply(net_params, in_state, in_ref)
        action_seq = jax.nn.sigmoid(logits).reshape(-1, horizon, 4)

        # action-regularization terms need no unroll state — keep AoS
        loss = 5.0 * jnp.sum((action_seq[:, :, 0] - 0.5) ** 2)
        loss += 0.1 * jnp.sum((action_seq[:, :, 1:] - 0.5) ** 2)

        a_t = jnp.transpose(action_seq, (1, 2, 0))  # (k, 4, B)
        ref_t = jnp.transpose(rel_ref, (1, 2, 0))  # (k, 9, B)
        s = tuple(current_state[:, i] for i in range(12))
        for k in range(horizon):
            a = tuple(a_t[k, j] for j in range(4))
            s = quad_step_soa(dyn_params, s, a, dt)
            loss += 10.0 * (
                jnp.sum((s[0] - ref_t[k, 0]) ** 2)
                + jnp.sum((s[1] - ref_t[k, 1]) ** 2)
                + jnp.sum((s[2] - ref_t[k, 2]) ** 2)
            )
            loss += (
                jnp.sum((s[6] - ref_t[k, 6]) ** 2)
                + jnp.sum((s[7] - ref_t[k, 7]) ** 2)
                + jnp.sum((s[8] - ref_t[k, 8]) ** 2)
            )
            loss += 0.1 * (
                jnp.sum(s[9] ** 2) + jnp.sum(s[10] ** 2) + jnp.sum(s[11] ** 2)
            )
        return loss

    def step(net_params, opt_state, dyn_params, states, refs):
        loss, grads = jax.value_and_grad(loss_fn)(
            net_params, dyn_params, states, refs
        )
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(net_params, updates), opt_state, loss

    return step


def make_run_iters(step, dyn, iters):
    @jax.jit
    def run_iters(net, opt_state, states, refs):
        def body(carry, _):
            n, o = carry
            n, o, loss = step(n, o, dyn, states, refs)
            return (n, o), loss

        (net, opt_state), losses = jax.lax.scan(
            body, (net, opt_state), None, length=iters
        )
        return net, opt_state, losses[-1]

    return run_iters


def time_step(step, dyn, net, opt_state, batch, iters, repeats):
    rng = np.random.RandomState(0)
    states = jnp.asarray(rng.randn(batch, 12).astype(np.float32) * 0.3)
    refs = jnp.asarray(rng.randn(batch, HORIZON, 9).astype(np.float32) * 0.3)
    run_iters = make_run_iters(step, dyn, iters)
    compiled = run_iters.lower(net, opt_state, states, refs).compile()
    out = compiled(net, opt_state, states, refs)
    jax.block_until_ready(out)
    dt = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = compiled(net, opt_state, states, refs)
        jax.block_until_ready(out)
        dt = min(dt, (time.perf_counter() - t0) / iters)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    net = init_control_net(key, 15, HORIZON, 9, HORIZON * 4, conv=True)
    optimizer = sgd_momentum(1e-5)
    opt_state = optimizer.init(net)
    dyn = quad_params()

    step_aos = build_concurrent_step(quad_step, optimizer, 0.1, HORIZON, 4)
    step_soa = build_concurrent_step_soa(optimizer, 0.1, HORIZON)

    # correctness: identical loss and updated params
    rng = np.random.RandomState(1)
    st = jnp.asarray(rng.randn(256, 12).astype(np.float32) * 0.3)
    rf = jnp.asarray(rng.randn(256, HORIZON, 9).astype(np.float32) * 0.3)
    n1, o1, l1 = jax.jit(step_aos)(net, opt_state, dyn, st, rf)
    n2, o2, l2 = jax.jit(step_soa)(net, opt_state, dyn, st, rf)
    dl = abs(float(l1) - float(l2)) / abs(float(l1))
    dp = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(n1), jax.tree.leaves(n2))
    )
    print(json.dumps({"check": "parity", "rel_loss_diff": dl,
                      "max_param_diff": dp}))

    for batch in (4096, 16384, 65536):
        iters = 50 if batch <= 4096 else 20
        repeats = 6 if batch <= 4096 else 4
        t_aos = time_step(step_aos, dyn, net, opt_state, batch, iters, repeats)
        t_soa = time_step(step_soa, dyn, net, opt_state, batch, iters, repeats)
        print(json.dumps({
            "batch": batch,
            "aos_ms": round(t_aos * 1e3, 4),
            "soa_ms": round(t_soa * 1e3, 4),
            "speedup": round(t_aos / t_soa, 3),
            "soa_env_steps_per_s": round(batch * HORIZON / t_soa, 1),
        }))


if __name__ == "__main__":
    main()
