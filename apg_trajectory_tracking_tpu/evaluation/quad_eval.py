"""Batched closed-loop quadrotor evaluation on reference trajectories.

Re-designs ``scripts/evaluate_drone.py`` (QuadEvaluator.follow_trajectory
:81-194 and run_eval:237-300): all test trajectories roll out in lockstep
inside one jitted ``lax.scan``; the reference's data-dependent control flow
becomes masks and selects:

  * divergence > thresh or instability -> train time: state is reset onto
    the reference (lines 177-184); test time: the rollout is marked done
    (break, line 179-182);
  * trajectory end (i >= ref_len) -> step masked invalid;
  * every ``take_every_x``-th step's (state, ref window) pair is emitted for
    self-play insertion (network_wrapper.py:42-68).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.data.dataset import quad_prepare_data
from apg_trajectory_tracking_tpu.dynamics.quad import quad_step, quad_is_stable
from apg_trajectory_tracking_tpu.models import control_net_apply
from apg_trajectory_tracking_tpu.trajectory.refs import array_ref_window


def _feedforward_apply(net_params, carry, in_state, in_ref):
    return carry, control_net_apply(net_params, in_state, in_ref)


@partial(
    jax.jit,
    static_argnames=(
        "dyn_step", "horizon", "max_steps", "dt", "test_time",
        "net_apply", "window_len", "action_transform", "net_window",
    ),
)
def follow_trajectories(
    net_params,
    dyn_params,
    references,
    ref_len,
    thresh_div=1.0,
    thresh_stable=1.0,
    dyn_step=quad_step,
    horizon=10,
    max_steps=251,
    dt=0.1,
    test_time=False,
    net_apply=_feedforward_apply,
    net_carry=None,
    window_len=None,
    action_transform=jax.nn.sigmoid,
    net_window=None,
):
    """Roll out the controller on a batch of reference trajectories.

    Args:
        net_params: controller params.
        dyn_params: QuadParams (or learnt-dynamics pytree accepted by
            ``dyn_step``).
        references: (n_test, T, 9) prepared reference trajectories
            [pos, att, vel].
        ref_len: int — usable reference length (same for all tests since the
            bank has fixed-length trajectories).
    Returns dict with:
        divergences: (n_test, max_steps) distance to the reference point.
        valid: (n_test, max_steps) step-executed mask
            (i <= ref_len, and not broken at test time).
        states: (n_test, max_steps, 12) visited states (for self-play).
        windows: (n_test, max_steps, horizon, 9) matching reference windows.
    """
    n_test = references.shape[0]
    if window_len is None:
        window_len = horizon
    if net_window is None:
        # recurrent modes carry a 2*horizon window but the net consumes the
        # first horizon rows (network_wrapper.py:55); wide-window students
        # (e.g. long-horizon MPC distillation) consume more
        net_window = horizon
    init_state = jnp.zeros((n_test, 12), dtype=jnp.float32)
    init_state = init_state.at[:, :3].set(references[:, 0, :3])

    def body(carry, i):
        state, done, nc = carry
        # reference window (random_traj.py:61-80) + featurize + act;
        # recurrent modes carry a window_len=2*horizon window but the net
        # consumes the first horizon rows (network_wrapper.py:55)
        window = jax.vmap(
            lambda ref: array_ref_window(ref, i, window_len)
        )(references)
        in_state, _, in_ref, _ = quad_prepare_data(state, window)
        nc, logits = net_apply(net_params, nc, in_state,
                               in_ref[:, :net_window])
        actions = action_transform(logits).reshape(n_test, -1, 4)
        new_state = dyn_step(dyn_params, state, actions[:, 0], dt)

        stable = quad_is_stable(new_state, thresh_stable)
        proj = references[:, jnp.minimum(i + 1, references.shape[1] - 1), :3]
        div = jnp.linalg.norm(proj - new_state[:, :3], axis=1)
        diverged = jnp.logical_or(div > thresh_div, ~stable)

        if test_time:
            # break on divergence: mark done, freeze state
            step_valid = jnp.logical_and(~done, i <= ref_len)
            new_done = jnp.logical_or(done, diverged)
            next_state = jnp.where(done[:, None], state, new_state)
        else:
            # reset-to-reference (evaluate_drone.py:177-184)
            ref_row = references[:, jnp.minimum(i + 1, references.shape[1] - 1)]
            reset_state = jnp.concatenate(
                [ref_row, jnp.zeros((n_test, 3))], axis=1
            )
            next_state = jnp.where(diverged[:, None], reset_state, new_state)
            step_valid = (i <= ref_len) & jnp.ones(n_test, dtype=bool)
            new_done = done

        out = (div, step_valid, state, window)
        return (next_state, new_done, nc), out

    init = (init_state, jnp.zeros(n_test, dtype=bool), net_carry)
    _, (divs, valid, states, windows) = jax.lax.scan(
        body, init, jnp.arange(max_steps)
    )
    return {
        "divergences": jnp.swapaxes(divs, 0, 1),
        "valid": jnp.swapaxes(valid, 0, 1),
        "states": jnp.swapaxes(states, 0, 1),
        "windows": jnp.swapaxes(windows, 0, 1),
    }


def follow_analytic(
    net_params,
    dyn_params,
    ref_window_fn,
    project_fn,
    init_state,
    thresh_div=1.0,
    thresh_stable=1.0,
    dyn_step=quad_step,
    horizon=10,
    max_steps=251,
    dt=0.1,
    net_apply=_feedforward_apply,
    net_carry=None,
):
    """Closed-loop rollout on an analytic reference (hover/straight/circle).

    The receding-horizon window is recomputed from the drone state each step
    via the closed-form min-jerk planner (the reference's Hover/Straight/
    Circle ``get_ref_traj``); episodes break on divergence (test-time
    semantics — the reference's train-time reset only exists for replay
    trajectories, evaluate_drone.py:177-184).

    Args:
        ref_window_fn: (state (12,)) -> (horizon, 9) min-jerk window.
        project_fn: (pos (3,)) -> (3,) projection onto the reference.
        init_state: (n, 12) initial states.
    Returns dict: divergences (n, T), valid (n, T), states (n, T, 12).
    """

    @partial(jax.jit, static_argnames=())
    def _run(net_params, dyn_params, init_state):
        n = init_state.shape[0]

        def body(carry, i):
            state, done, nc = carry
            window = jax.vmap(ref_window_fn)(state)
            in_state, _, in_ref, _ = quad_prepare_data(state, window)
            nc, logits = net_apply(net_params, nc, in_state, in_ref)
            actions = jax.nn.sigmoid(logits).reshape(n, -1, 4)
            new_state = dyn_step(dyn_params, state, actions[:, 0], dt)
            stable = quad_is_stable(new_state, thresh_stable)
            proj = jax.vmap(project_fn)(new_state[:, :3])
            div = jnp.linalg.norm(proj - new_state[:, :3], axis=1)
            diverged = jnp.logical_or(div > thresh_div, ~stable)
            step_valid = ~done
            new_done = jnp.logical_or(done, diverged)
            next_state = jnp.where(done[:, None], state, new_state)
            return (next_state, new_done, nc), (div, step_valid, next_state)

        init = (init_state, jnp.zeros(n, dtype=bool), net_carry)
        _, (divs, valid, states) = jax.lax.scan(
            body, init, jnp.arange(max_steps)
        )
        return (
            jnp.swapaxes(divs, 0, 1),
            jnp.swapaxes(valid, 0, 1),
            jnp.swapaxes(states, 0, 1),
        )

    divs, valid, states = _run(net_params, dyn_params, init_state)
    return {"divergences": divs, "valid": valid, "states": states}


def run_eval(
    net_params,
    dyn_params,
    references,
    ref_len,
    thresh_div=1.0,
    thresh_stable=1.0,
    horizon=10,
    max_steps=251,
    dt=0.1,
    test_time=False,
    dyn_step=quad_step,
    net_apply=_feedforward_apply,
    net_carry=None,
    window_len=None,
    mesh=None,
    action_transform=jax.nn.sigmoid,
    net_window=None,
):
    """Aggregate eval metrics (run_eval, evaluate_drone.py:237-300).

    Returns the reference's 6-tuple as a dict:
    mean/std of stable step counts, mean/std divergence of full runs,
    mean/std divergence overall — plus the rollout dict for self-play.

    With ``mesh`` the episode batch is sharded on the 'env' axis (padded by
    repeating episodes when nr_test doesn't divide the mesh; the pad rows
    are sliced off before metrics, so the protocol is unchanged) — the
    trainers pass their mesh so closed-loop eval runs on the same
    data-parallel path as training.
    """
    n_req = references.shape[0]
    if mesh is not None and mesh.shape["env"] > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from apg_trajectory_tracking_tpu.parallel.mesh import pad_to_multiple

        nd = mesh.shape["env"]
        references, _ = pad_to_multiple(jnp.asarray(references), nd)
        references = jax.device_put(references, NamedSharding(mesh, P("env")))
        if net_carry is not None:
            net_carry, _ = pad_to_multiple(net_carry, nd)
            net_carry = jax.device_put(
                net_carry, NamedSharding(mesh, P("env"))
            )
    roll = follow_trajectories(
        net_params, dyn_params, references, ref_len,
        thresh_div=thresh_div, thresh_stable=thresh_stable,
        dyn_step=dyn_step, horizon=horizon, max_steps=max_steps, dt=dt,
        test_time=test_time, net_apply=net_apply, net_carry=net_carry,
        window_len=window_len, action_transform=action_transform,
        net_window=net_window,
    )
    if roll["divergences"].shape[0] != n_req:
        roll = {k: v[:n_req] for k, v in roll.items()}
    metrics = metrics_from_rollout(
        np.asarray(roll["divergences"]), np.asarray(roll["valid"]),
        thresh_div, max_steps, ref_len,
    )
    return metrics, roll


def metrics_from_rollout(divs, valid, thresh_div, max_steps, ref_len):
    """The reference's 6-tuple of eval metrics (evaluate_drone.py:237-300)
    from per-step divergence/valid masks — shared by the jitted evaluator
    above and the external-simulator host loop
    (envs/external_sim.evaluate_external). Beyond the reference's point
    estimates, every aggregate carries the episode count and a 95% CI
    (Wilson for ratio_stable, seeded bootstrap for mean divergence) —
    at n = 20-100 episodes ratio_stable alone swings +/- 10-15 points
    between draws, so tables must not ship the ratio bare."""
    from apg_trajectory_tracking_tpu.evaluation.stats import (
        bootstrap_ci,
        wilson_ci,
    )

    n_steps = valid.sum(axis=1)
    div_mean_per = np.where(
        n_steps > 0, (divs * valid).sum(axis=1) / np.maximum(n_steps, 1), 0.0
    )
    stable_counts = ((divs < thresh_div) & valid).sum(axis=1)
    max_steps_stable = int(min(max_steps, ref_len + 1))
    full = stable_counts == max_steps_stable
    ratio_stable = float(full.mean())
    div_full = div_mean_per[full] if full.any() else div_mean_per

    n = int(len(div_mean_per))
    return {
        "mean_success": float(stable_counts.mean()),
        "std_success": float(stable_counts.std()),
        "mean_divergence_full": float(div_full.mean()),
        "std_divergence_full": float(div_full.std()),
        "mean_divergence": float(div_mean_per.mean()),
        "std_divergence": float(div_mean_per.std()),
        "ratio_stable": ratio_stable,
        "n": n,
        "ratio_stable_ci": list(wilson_ci(int(full.sum()), n)),
        "mean_divergence_ci": list(bootstrap_ci(div_mean_per)),
    }
