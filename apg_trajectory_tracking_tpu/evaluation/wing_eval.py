"""Batched closed-loop fixed-wing evaluation: fly to a waypoint.

Re-designs ``scripts/evaluate_fixed_wing.py`` (fly_to_point:46-130 and
run_eval:132-178): all test episodes run in one jitted scan; the waypoint
pass (x-crossing), divergence handling (train-time reset onto the line at
cruise speed vs test-time break), and the target-distance metric become
masked selects.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.data.dataset import wing_prepare_data
from apg_trajectory_tracking_tpu.dynamics.fixed_wing import (
    wing_step,
    wing_is_stable,
)
from apg_trajectory_tracking_tpu.models import control_net_apply
from apg_trajectory_tracking_tpu.trajectory.refs import project_to_line

DES_SPEED = 11.5  # evaluate_fixed_wing.py:43


def _feedforward_apply(net_params, carry, normed, rel_ref):
    """Default controller hook: the APG wing net (state + ref features)."""
    return carry, control_net_apply(net_params, normed, rel_ref)


def waypoint_step_events(state, new_state, targets, line_start, done,
                         dsum, dcnt, npass, thresh_div, thresh_stable):
    """One control step of TEST-TIME pass/divergence event accounting,
    shared by every wing waypoint driver (APG/PPO ``fly_to_point``,
    ``compare.mpc_fly_to_point``, ``pets.eval_pets_wing_waypoints``) so the
    head-to-head protocol cannot drift between controller families.

    Events (fly_to_point, evaluate_fixed_wing.py:91-126): crossing the
    target's x records the distance of the target to the passed segment;
    diverging from the origin->target line (or losing attitude stability)
    records the current distance to the target; either ends the episode.
    Ended episodes latch their state.

    Returns (next_state, new_done, dsum, dcnt, npass, active).
    """
    batched_proj = jax.vmap(project_to_line)
    stable = wing_is_stable(new_state, thresh_stable)
    pos = new_state[:, :3]
    drone_on_line = batched_proj(line_start, targets, pos)
    div = jnp.linalg.norm(drone_on_line - pos, axis=1)
    passed = pos[:, 0] > targets[:, 0]
    prev_pos = state[:, :3]
    target_on_traj = batched_proj(prev_pos, pos, targets)
    pass_div = jnp.linalg.norm(target_on_traj - targets, axis=1)
    diverged = jnp.logical_or(div > thresh_div, ~stable)

    active = ~done
    event_div = jnp.where(
        passed, pass_div, jnp.linalg.norm(pos - targets, axis=1)
    )
    event = jnp.logical_and(active, jnp.logical_or(passed, diverged))
    dsum = dsum + jnp.where(event, event_div, 0.0)
    dcnt = dcnt + event.astype(jnp.int32)
    new_done = jnp.logical_or(done, jnp.logical_or(passed, diverged))
    npass = jnp.logical_or(npass, jnp.logical_and(active, passed))
    next_state = jnp.where(done[:, None], state, new_state)
    return next_state, new_done, dsum, dcnt, npass, active


def finalize_waypoint_counts(dsum, dcnt, thresh_div):
    """Never-ended episodes get the max-steps thresh_div penalty
    (fly_to_point:124-126); guards the per-episode mean's denominator."""
    dsum = dsum + jnp.where(dcnt == 0, thresh_div, 0.0)
    return dsum, jnp.maximum(dcnt, 1)


@partial(
    jax.jit,
    static_argnames=(
        "dyn_step", "horizon", "max_steps", "dt", "test_time",
        "net_apply", "action_transform",
    ),
)
def fly_to_point(
    net_params,
    dyn_params,
    targets,
    mean,
    std,
    thresh_div=4.0,
    thresh_stable=0.4,
    dyn_step=wing_step,
    horizon=10,
    max_steps=1000,
    dt=0.05,
    test_time=False,
    net_apply=_feedforward_apply,
    net_carry=None,
    action_transform=jax.nn.sigmoid,
):
    """Fly a batch of episodes from zero-reset toward per-episode targets.

    Args:
        targets: (n, 3) waypoints (x ~ 50, y/z ~ +-5).
        mean, std: (12,) normalization stats for the state features.
    Returns dict:
        div_target_sum/cnt: per-episode sum & count of target divergences
            (the metric entries of fly_to_point:91-126);
        states/refs/valid: visited (state, target) pairs for self-play;
        steps_alive: per-episode steps before ending.
    """
    n = targets.shape[0]
    state0 = jnp.zeros((n, 12), dtype=jnp.float32).at[:, 3].set(DES_SPEED)
    line_start0 = state0[:, :3]

    batched_proj = jax.vmap(project_to_line)

    def body(carry, i):
        state, line_start, done, dsum, dcnt, npass, nc = carry
        normed, _, rel_ref, _ = wing_prepare_data(
            state, targets, mean, std, dt=dt, horizon=horizon
        )
        nc, logits = net_apply(net_params, nc, normed, rel_ref)
        # (n, horizon*4) APG nets and (n, 4) one-step policies (PPO) both
        # reduce to the first action row
        actions = action_transform(logits).reshape(n, -1, 4)
        new_state = dyn_step(dyn_params, state, actions[:, 0], dt)

        if test_time:
            next_state, new_done, dsum, dcnt, npass, active = (
                waypoint_step_events(
                    state, new_state, targets, line_start, done, dsum,
                    dcnt, npass, thresh_div, thresh_stable,
                )
            )
            new_line_start = line_start
        else:
            stable = wing_is_stable(new_state, thresh_stable)
            pos = new_state[:, :3]
            drone_on_line = batched_proj(line_start, targets, pos)
            div = jnp.linalg.norm(drone_on_line - pos, axis=1)

            # waypoint passed: x beyond the target's x (fly_to_point:91-109)
            passed = pos[:, 0] > targets[:, 0]
            prev_pos = state[:, :3]
            target_on_traj = batched_proj(prev_pos, pos, targets)
            pass_div = jnp.linalg.norm(target_on_traj - targets, axis=1)

            diverged = jnp.logical_or(div > thresh_div, ~stable)

            active = ~done
            # train time: divergence -> thresh_div penalty + reset onto the
            # line flying at cruise speed toward the target
            # (fly_to_point:111-123); pass ends the episode
            event_pass = jnp.logical_and(active, passed)
            event_div_ = jnp.logical_and(active, jnp.logical_and(diverged, ~passed))
            dsum = dsum + jnp.where(event_pass, pass_div, 0.0)
            dsum = dsum + jnp.where(event_div_, thresh_div, 0.0)
            dcnt = dcnt + event_pass.astype(jnp.int32) + event_div_.astype(jnp.int32)
            vec = targets - drone_on_line
            vec_unit = vec / jnp.linalg.norm(vec, axis=1, keepdims=True)
            reset_state = jnp.zeros_like(new_state)
            reset_state = reset_state.at[:, :3].set(drone_on_line)
            reset_state = reset_state.at[:, 3:6].set(vec_unit * DES_SPEED)
            next_state = jnp.where(
                jnp.logical_and(diverged, ~passed)[:, None],
                reset_state,
                new_state,
            )
            next_state = jnp.where(done[:, None], state, next_state)
            new_done = jnp.logical_or(done, passed)
            new_line_start = line_start
            npass = jnp.logical_or(npass, event_pass)

        out = (state, active)
        return (next_state, new_line_start, new_done, dsum, dcnt, npass,
                nc), out

    init = (
        state0,
        line_start0,
        jnp.zeros(n, dtype=bool),
        jnp.zeros(n),
        jnp.zeros(n, dtype=jnp.int32),
        jnp.zeros(n, dtype=bool),
        net_carry,
    )
    (final_state, _, done, dsum, dcnt, npass, _), (states, valid) = jax.lax.scan(
        body, init, jnp.arange(max_steps)
    )
    dsum, dcnt = finalize_waypoint_counts(dsum, dcnt, thresh_div)
    return {
        "div_target_sum": dsum,
        "div_target_cnt": dcnt,
        "passed": npass,
        "states": jnp.swapaxes(states, 0, 1),
        "valid": jnp.swapaxes(valid, 0, 1),
        "steps_alive": jnp.sum(jnp.swapaxes(valid, 0, 1), axis=1),
    }


def run_eval(
    net_params,
    dyn_params,
    key,
    mean,
    std,
    nr_test=10,
    x_dist=50.0,
    x_std=5.0,
    thresh_div=4.0,
    thresh_stable=0.4,
    horizon=10,
    max_steps=1000,
    dt=0.05,
    test_time=False,
    dyn_step=wing_step,
    mesh=None,
    net_apply=_feedforward_apply,
    net_carry=None,
    action_transform=jax.nn.sigmoid,
):
    """Aggregate metrics (run_eval, evaluate_fixed_wing.py:132-178):
    mean/std over episodes of the mean target divergence.

    With ``mesh`` the episode batch is sharded on 'env' (padded by repeated
    episodes when needed, sliced off before metrics)."""
    yz = (jax.random.uniform(key, (nr_test, 2)) - 0.5) * 2 * x_std
    targets = jnp.concatenate(
        [jnp.full((nr_test, 1), x_dist), yz], axis=1
    ).astype(jnp.float32)
    if mesh is not None and mesh.shape["env"] > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from apg_trajectory_tracking_tpu.parallel.mesh import pad_to_multiple

        targets, _ = pad_to_multiple(targets, mesh.shape["env"])
        targets = jax.device_put(targets, NamedSharding(mesh, P("env")))
    roll = fly_to_point(
        net_params, dyn_params, targets, mean, std,
        thresh_div=thresh_div, thresh_stable=thresh_stable,
        dyn_step=dyn_step, horizon=horizon, max_steps=max_steps, dt=dt,
        test_time=test_time, net_apply=net_apply, net_carry=net_carry,
        action_transform=action_transform,
    )
    if roll["div_target_sum"].shape[0] != nr_test:
        roll = {k: v[:nr_test] for k, v in roll.items()}
        targets = targets[:nr_test]
    per_ep = np.asarray(roll["div_target_sum"]) / np.asarray(
        roll["div_target_cnt"]
    )
    from apg_trajectory_tracking_tpu.evaluation.stats import bootstrap_ci

    metrics = {
        "mean_success": float(per_ep.mean()),
        "std_success": float(per_ep.std()),
        "mean_steps_alive": float(np.asarray(roll["steps_alive"]).mean()),
        "n": int(per_ep.size),
        "mean_success_ci": list(bootstrap_ci(per_ep)),
    }
    return metrics, roll, targets
