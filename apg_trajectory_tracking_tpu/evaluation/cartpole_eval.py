"""Batched closed-loop cartpole evaluation (balance + swing-up).

Re-designs ``scripts/evaluate_cartpole.py:79-318``: the per-iteration python
rollouts become one jitted ``lax.scan`` over time with all eval episodes
batched, and the early ``break`` on falling becomes an alive-mask.
"""

from functools import partial

import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_params
from apg_trajectory_tracking_tpu.envs.cartpole_env import (
    env_step,
    is_upright,
    reset_swingup,
)
from apg_trajectory_tracking_tpu.models import cartpole_net_apply


@partial(
    jax.jit,
    static_argnames=("nr_iters", "horizon", "max_steps", "dt", "net_apply"),
)
def evaluate_balance(
    net_params,
    dyn_params,
    nr_iters=10,
    max_steps=250,
    dt=0.05,
    horizon=10,
    thresh_div=0.21,
    states=None,
    net_apply=cartpole_net_apply,
):
    """Balance evaluation (evaluate_cartpole.py:79-262).

    Episodes start from the exact zero state (the reference's
    ``initialize_straight`` zeroes position, velocity, and angle,
    lines 103-114) unless explicit ``states`` (n, 4) are given (used by the
    baseline head-to-head, which starts all controllers from the same
    near-upright perturbations). ``net_apply(params, states) -> (n, horizon)
    actions`` swaps in other controller families. Returns the metrics dict
    of the reference: mean/std |cart velocity| over steps taken, mean/std
    steps balanced.
    """
    if states is None:
        states = jnp.zeros((nr_iters, 4), dtype=jnp.float32)
    else:
        nr_iters = states.shape[0]

    def body(carry, i):
        state, alive, steps, vel_sum, vel_sq_sum, n_vel = carry
        actions = net_apply(net_params, state)
        a0 = actions.reshape(-1, horizon, 1)[:, 0]
        new_state = env_step(dyn_params, state, a0, dt)
        # velocity recorded for every executed step (while alive)
        v = jnp.abs(new_state[:, 1])
        vel_sum = vel_sum + jnp.where(alive, v, 0.0)
        vel_sq_sum = vel_sq_sum + jnp.where(alive, v * v, 0.0)
        n_vel = n_vel + alive.astype(jnp.int32)
        # success counter = last step index reached (break on fall)
        upright = is_upright(new_state, thresh_div)
        steps = jnp.where(alive, i, steps)
        alive = jnp.logical_and(alive, upright)
        state = jnp.where(alive[:, None], new_state, state)
        return (state, alive, steps, vel_sum, vel_sq_sum, n_vel), None

    init = (
        states,
        jnp.ones(nr_iters, dtype=bool),
        jnp.zeros(nr_iters, dtype=jnp.int32),
        jnp.zeros(nr_iters),
        jnp.zeros(nr_iters),
        jnp.zeros(nr_iters, dtype=jnp.int32),
    )
    (_, _, steps, vel_sum, vel_sq_sum, n_vel), _ = jax.lax.scan(
        body, init, jnp.arange(max_steps)
    )
    total_n = jnp.maximum(jnp.sum(n_vel), 1)
    mean_vel = jnp.sum(vel_sum) / total_n
    var_vel = jnp.sum(vel_sq_sum) / total_n - mean_vel**2
    return {
        "mean_vel": mean_vel,
        "std_vel": jnp.sqrt(jnp.maximum(var_vel, 0.0)),
        "mean_stable": jnp.mean(steps.astype(jnp.float32)),
        "std_stable": jnp.std(steps.astype(jnp.float32)),
        # per-episode steps balanced, for host-side CIs (balance_metrics)
        "steps_per_episode": steps,
    }


def balance_metrics(raw):
    """Host-side aggregate of an evaluate_balance return: floats plus
    n + 95% CIs (bootstrap on mean steps balanced, Wilson on the ratio
    of episodes that held the full window)."""
    import numpy as np

    from apg_trajectory_tracking_tpu.evaluation.stats import (
        steps_balance_summary,
    )

    steps = np.asarray(raw["steps_per_episode"])
    m = {k: float(v) for k, v in raw.items() if k != "steps_per_episode"}
    m.update(steps_balance_summary(steps))
    return m


@partial(
    jax.jit,
    static_argnames=(
        "nr_iters", "horizon", "max_steps", "dt", "burn_in", "net_apply",
    ),
)
def evaluate_swingup(
    net_params,
    dyn_params,
    key,
    nr_iters=10,
    max_steps=250,
    dt=0.05,
    horizon=10,
    burn_in=100,
    net_apply=cartpole_net_apply,
    carry0=None,
):
    """Swing-up evaluation (evaluate_cartpole.py:264-318).

    Starts hanging down; success = pole upright throughout the post-burn-in
    window. The reference's success check is one-sided (``theta > 1``,
    line 301) — we use |theta| > 1, which is strictly harder and symmetric.
    Also returns mean/std |velocity| post burn-in (the save-model score,
    suc_up_down=-1). ``net_apply(params, states) -> (n, horizon) actions``
    swaps in other controller families (the head-to-head MPC row).

    Stateful controllers (warm-started MPC, recurrent policies) pass
    ``carry0`` and a ``net_apply(params, states, carry) -> (actions,
    carry)`` that threads their state through the episode scan.
    """
    states = reset_swingup(key, nr_iters)
    stateful = carry0 is not None

    def body(carry, i):
        state, upright_ok, vel_sum, vel_sq_sum, ctrl = carry
        if stateful:
            actions, ctrl = net_apply(net_params, state, ctrl)
        else:
            actions = net_apply(net_params, state)
        a0 = actions.reshape(-1, horizon, 1)[:, 0]
        new_state = env_step(dyn_params, state, a0, dt)
        past_burn = i > burn_in
        v = jnp.abs(new_state[:, 1])
        vel_sum = vel_sum + jnp.where(past_burn, v, 0.0)
        vel_sq_sum = vel_sq_sum + jnp.where(past_burn, v * v, 0.0)
        upright_ok = jnp.logical_and(
            upright_ok,
            jnp.logical_or(~past_burn, jnp.abs(new_state[:, 2]) <= 1.0),
        )
        return (new_state, upright_ok, vel_sum, vel_sq_sum, ctrl), None

    init = (
        states,
        jnp.ones(nr_iters, dtype=bool),
        jnp.zeros(nr_iters),
        jnp.zeros(nr_iters),
        carry0 if stateful else jnp.zeros(()),
    )
    (final_state, success, vel_sum, vel_sq_sum, _), _ = jax.lax.scan(
        body, init, jnp.arange(max_steps)
    )
    n = max_steps - burn_in - 1
    mean_vel = jnp.mean(vel_sum / n)
    return {
        "mean_vel": mean_vel,
        "std_vel": jnp.std(vel_sum / n),
        "success_rate": jnp.mean(success.astype(jnp.float32)),
        # per-episode outcomes for host-side CIs (swingup_metrics)
        "success_per_episode": success,
        "final_angle_per_episode": jnp.abs(final_state[:, 2]),
        "vel_per_episode": vel_sum / n,
    }


def swingup_metrics(net_params, dyn_params, key, nr_iters=10, max_steps=250,
                    dt=0.05, horizon=10, burn_in=100,
                    net_apply=cartpole_net_apply, init_carry=None):
    """Host-side swing-up head-to-head row: floats + n + 95% CIs (Wilson
    on success_rate, bootstrap on mean post-burn-in |velocity|).

    ``init_carry(states) -> carry0`` marks ``net_apply`` as stateful; it is
    seeded with the same episode starts the evaluator draws (same key).
    """
    import numpy as np

    from apg_trajectory_tracking_tpu.evaluation.stats import (
        bootstrap_ci,
        wilson_ci,
    )

    carry0 = (
        init_carry(reset_swingup(key, nr_iters))
        if init_carry is not None else None
    )
    raw = evaluate_swingup(
        net_params, dyn_params, key, nr_iters=nr_iters, max_steps=max_steps,
        dt=dt, horizon=horizon, burn_in=burn_in, net_apply=net_apply,
        carry0=carry0,
    )
    success = np.asarray(raw["success_per_episode"])
    vels = np.asarray(raw["vel_per_episode"])
    angle = np.asarray(raw["final_angle_per_episode"])
    n = int(success.size)
    return {
        "success_rate": float(success.mean()),
        "success_rate_ci": list(wilson_ci(int(success.sum()), n)),
        "mean_vel": float(vels.mean()),
        "mean_vel_ci": list(bootstrap_ci(vels)),
        "mean_final_angle": float(angle.mean()),
        "n": n,
    }
