"""Head-to-head baseline comparison on the tracking metric.

The reference evaluates its PPO policy through the same quad evaluator and
divergence metric as APG (``baselines/ppo_baseline.py:322-340`` ->
``evaluate_drone.run_eval``); this module does that for every controller
family so one table compares APG vs MPC (Adam shooting and iLQR) vs PPO on
identical test trajectories:

  * APG nets go through :func:`quad_eval.run_eval` directly;
  * PPO actors are adapted into the same evaluator (obs = the RL env's
    [ref-features, state-features] concatenation, tanh-space mean action
    rescaled like ``QuadEnvRL.step``, rl_envs.py:313);
  * MPC solves run batched over all test trajectories inside one scan —
    the reference's per-step IPOPT loop with ``F.map(openmp)``
    (mpc.py:173,303) becomes a vmapped in-graph solve.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.baselines.ppo import policy_mean
from apg_trajectory_tracking_tpu.dynamics.quad import quad_step, quad_is_stable
from apg_trajectory_tracking_tpu.trajectory.refs import array_ref_window


def ppo_net_apply(params, carry, in_state, in_ref):
    """Adapt a PPO actor to the quad evaluator's net interface: the RL
    env's observation layout (rl_envs.make_quad_rl _obs) from the
    evaluator's featurized inputs."""
    obs = jnp.concatenate(
        [in_ref.reshape(in_ref.shape[0], -1), in_state], axis=1
    )
    return carry, policy_mean(params, obs)


def ppo_action_transform(mean):
    """Deterministic eval action: clipped mean rescaled from [-1, 1] to the
    env's [0, 1] (rl_envs.py:313)."""
    return (jnp.clip(mean, -1.0, 1.0) + 1.0) / 2.0


@partial(
    jax.jit,
    static_argnames=("solve", "dyn_step", "horizon", "max_steps", "dt"),
)
def mpc_follow_trajectories(
    solve,
    dyn_params,
    references,
    ref_len,
    thresh_div=1.0,
    thresh_stable=1.0,
    dyn_step=quad_step,
    horizon=10,
    max_steps=251,
    dt=0.1,
):
    """Batched receding-horizon MPC rollout with the evaluator's test-time
    semantics (break on divergence/instability) and warm-start shifting
    (mpc.py:336-338). ``solve(dyn_params, x0 (12,), ref (h, 12), z (h, u))
    -> (u_seq, z, cost)`` is vmapped over the trajectory batch.

    Returns the same {divergences, valid} contract as follow_trajectories,
    so run-of-the-mill metrics code applies unchanged.
    """
    n = references.shape[0]
    u_dim = 4
    v_solve = jax.vmap(solve, in_axes=(None, 0, 0, 0))

    init_state = jnp.zeros((n, 12), dtype=jnp.float32)
    init_state = init_state.at[:, :3].set(references[:, 0, :3])
    z0 = jnp.zeros((n, horizon, u_dim), jnp.float32)

    def body(carry, i):
        state, z, done = carry
        # MPC consumes raw [pos, att, vel] rows padded to 12 state dims
        # (MPC._ref_quad); the window starts at the NEXT reference row,
        # like the reference's evaluate loop
        window9 = jax.vmap(
            lambda ref: array_ref_window(ref, i, horizon)
        )(references)
        window = jnp.concatenate(
            [window9, jnp.zeros((n, horizon, 3), jnp.float32)], axis=2
        )
        u_seq, z_new, _ = v_solve(dyn_params, state, window, z)
        new_state = dyn_step(dyn_params, state, u_seq[:, 0], dt)
        # warm start: shift one step
        z_shift = jnp.concatenate([z_new[:, 1:], z_new[:, -1:]], axis=1)

        stable = quad_is_stable(new_state, thresh_stable)
        proj = references[:, jnp.minimum(i + 1, references.shape[1] - 1), :3]
        div = jnp.linalg.norm(proj - new_state[:, :3], axis=1)
        diverged = jnp.logical_or(div > thresh_div, ~stable)

        step_valid = jnp.logical_and(~done, i <= ref_len)
        new_done = jnp.logical_or(done, diverged)
        next_state = jnp.where(done[:, None], state, new_state)
        next_z = jnp.where(done[:, None, None], z, z_shift)
        return (next_state, next_z, new_done), (div, step_valid)

    init = (init_state, z0, jnp.zeros(n, dtype=bool))
    _, (divs, valid) = jax.lax.scan(body, init, jnp.arange(max_steps))
    return {
        "divergences": jnp.swapaxes(divs, 0, 1),
        "valid": jnp.swapaxes(valid, 0, 1),
    }


def tracking_metrics(roll, thresh_div, ref_len, max_steps=251):
    """The quad evaluator's aggregate metrics (evaluate_drone.py:237-300)
    from a {divergences, valid} rollout dict — delegates to
    quad_eval.metrics_from_rollout so every table row (MPC included)
    carries the same n + 95% CI fields."""
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import (
        metrics_from_rollout,
    )

    return metrics_from_rollout(
        np.asarray(roll["divergences"]), np.asarray(roll["valid"]),
        thresh_div, max_steps, ref_len,
    )


def make_cartpole_mpc_apply(mpc):
    """Adapt the cartpole MPC into the balance evaluator's net_apply
    interface: per-step cold-start solve toward the ramp-to-zero reference
    (MPC._ref_cartpole; the evaluator's stateless policy interface means no
    warm start is threaded — the Adam solve budget covers it)."""
    horizon = mpc.horizon
    v_solve = jax.vmap(mpc._solve, in_axes=(None, 0, 0, 0))
    alphas = jnp.linspace(1.0, 0.0, horizon + 2)[1:-1]

    def mpc_apply(_, states):
        n = states.shape[0]
        refs = states[:, None, :4] * alphas[None, :, None]
        z0 = jnp.zeros((n, horizon, 1), jnp.float32)
        u, _, _ = v_solve(mpc.dyn_params, states, refs, z0)
        return u[:, :, 0]

    return mpc_apply


def eval_cartpole_ppo_balance(params, dyn_params, starts, max_steps=250,
                              dt=0.05, thresh_div=0.21):
    """Run a cartpole PPO policy (history-observation RL env) from given
    start states and report the balance evaluator's metrics."""
    from apg_trajectory_tracking_tpu.baselines.rl_envs import (
        make_cartpole_rl,
    )

    reset_fn, step_fn, obs_dim, act_dim = make_cartpole_rl(dyn_params, dt=dt)
    n = starts.shape[0]

    # build env states seeded with the shared starts: history buffers
    # filled with the start state, zero past actions
    proto, _ = jax.vmap(reset_fn)(jax.random.split(jax.random.PRNGKey(0), n))
    env_states = proto._replace(
        state=starts,
        state_buffer=jnp.repeat(
            starts[:, None, :], proto.state_buffer.shape[1], axis=1
        ),
        action_buffer=jnp.zeros_like(proto.action_buffer),
        step_ind=jnp.zeros(n, jnp.int32),
    )

    def obs_of(s):
        # the env's observation layout (rl_envs.make_cartpole_rl _obs):
        # 3 rows of [state(4), action(1)] history, flattened
        hist = jnp.concatenate(
            [s.state_buffer[:3], s.action_buffer[:3]], axis=1
        )
        return hist.reshape(-1)

    @jax.jit
    def run(params, env_states):
        def body(carry, i):
            s, alive, steps, vel_sum, n_vel = carry
            obs = jax.vmap(obs_of)(s)
            act = jnp.clip(policy_mean(params, obs), -1.0, 1.0)
            nxt, _, _, done = jax.vmap(step_fn)(
                s, act, jax.random.split(jax.random.PRNGKey(0), n)
            )
            v = jnp.abs(nxt.state[:, 1])
            upright = jnp.abs(nxt.state[:, 2]) < thresh_div
            vel_sum = vel_sum + jnp.where(alive, v, 0.0)
            n_vel = n_vel + alive.astype(jnp.int32)
            steps = jnp.where(alive, i, steps)
            alive = alive & upright
            # latch: keep the old env state once an episode ends
            s = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    alive.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
                ),
                nxt, s,
            )
            return (s, alive, steps, vel_sum, n_vel), None

        init = (
            env_states, jnp.ones(n, bool), jnp.zeros(n, jnp.int32),
            jnp.zeros(n), jnp.zeros(n, jnp.int32),
        )
        (_, _, steps, vel_sum, n_vel), _ = jax.lax.scan(
            body, init, jnp.arange(max_steps)
        )
        return steps, vel_sum, n_vel

    steps, vel_sum, n_vel = run(params, env_states)
    steps = np.asarray(steps, dtype=float)
    mean_vel = float(np.asarray(vel_sum).sum() / max(np.asarray(n_vel).sum(), 1))
    from apg_trajectory_tracking_tpu.evaluation.stats import (
        steps_balance_summary,
    )

    m = {
        "mean_vel": mean_vel,
        "mean_stable": float(steps.mean()),
        "std_stable": float(steps.std()),
    }
    m.update(steps_balance_summary(steps))
    return m


def ppo_wing_net_apply(params, carry, normed, rel_ref):
    """Adapt a wing PPO actor to the wing evaluator's net interface: the RL
    env's observation layout (rl_envs.make_wing_rl _obs: [rel_ref(3),
    normed(9)])."""
    obs = jnp.concatenate([rel_ref, normed], axis=1)
    return carry, policy_mean(params, obs)


def ppo_wing_action_transform(mean):
    """Deterministic eval action for the wing policy. The wing RL env
    consumes raw [0, 1] actions (make_wing_rl steps wing_step directly;
    PPOConfig(act_low=0, act_high=1)), so eval clips the mean like
    ppo.evaluate_policy — no tanh-space rescale."""
    return jnp.clip(mean, 0.0, 1.0)


def mpc_fly_to_point(
    solve,
    dyn_params,
    targets,
    thresh_div=10.0,
    thresh_stable=3.0,
    dyn_step=None,
    horizon=10,
    max_steps=1000,
    dt=0.05,
    segment_len=125,
):
    """Batched receding-horizon MPC waypoint flight with the wing
    evaluator's test-time semantics (wing_eval.fly_to_point: x-crossing
    pass, target-to-passed-segment metric, break on divergence) and
    warm-start shifting. The per-step reference is MPC._ref_wing's linear
    ramp toward the target at the current speed, built in-graph so the
    whole episode batch runs in one scan (the reference's per-step IPOPT
    loop, evaluate_fixed_wing.py:216-245).

    Returns the same {div_target_sum/cnt, steps_alive} contract as
    fly_to_point, so one metrics path serves every table row.
    """
    from apg_trajectory_tracking_tpu.dynamics.fixed_wing import wing_step
    from apg_trajectory_tracking_tpu.evaluation.wing_eval import (
        DES_SPEED,
        finalize_waypoint_counts,
        waypoint_step_events,
    )

    if dyn_step is None:
        dyn_step = wing_step
    n = targets.shape[0]
    state0 = jnp.zeros((n, 12), dtype=jnp.float32).at[:, 3].set(DES_SPEED)
    line_start0 = state0[:, :3]
    z0 = jnp.zeros((n, horizon, 4), jnp.float32)
    v_solve = jax.vmap(solve, in_axes=(None, 0, 0, 0))

    def ramp(state, target):
        # MPC._ref_wing in-graph: horizon positions marching toward the
        # target at the current speed; non-position ref rows stay zero
        pos, vel = state[:3], state[3:6]
        vec = target - pos
        speed = jnp.linalg.norm(vel)
        step_vec = vec * (
            speed * dt / jnp.maximum(jnp.linalg.norm(vec), 1e-6)
        )
        steps = jnp.arange(1, horizon + 1, dtype=state.dtype)[:, None]
        ref = jnp.zeros((horizon, 12), state.dtype)
        return ref.at[:, :3].set(pos[None] + steps * step_vec)

    def body(carry, _):
        state, z, done, dsum, dcnt, npass, nalive = carry
        refs = jax.vmap(ramp)(state, targets)
        u_seq, z_new, _ = v_solve(dyn_params, state, refs, z)
        z_shift = jnp.concatenate([z_new[:, 1:], z_new[:, -1:]], axis=1)
        new_state = dyn_step(dyn_params, state, u_seq[:, 0], dt)

        next_state, new_done, dsum, dcnt, npass, active = (
            waypoint_step_events(
                state, new_state, targets, line_start0, done, dsum, dcnt,
                npass, thresh_div, thresh_stable,
            )
        )
        next_z = jnp.where(done[:, None, None], z, z_shift)
        nalive = nalive + active.astype(jnp.int32)
        return (
            next_state, next_z, new_done, dsum, dcnt, npass, nalive
        ), None

    # the full 1000-step scan with the solver's inner optimization loop in
    # its body is one enormous device program — large enough to take down
    # the TPU worker. Chunk it into bounded segments driven from the host,
    # which also gives early exit once every episode has ended (typical
    # pass happens within ~100-300 steps).
    segments = {}

    def run_segment(carry, length):
        if length not in segments:
            segments[length] = jax.jit(
                lambda c: jax.lax.scan(body, c, None, length=length)[0]
            )
        return segments[length](carry)

    carry = (
        state0, z0, jnp.zeros(n, dtype=bool), jnp.zeros(n),
        jnp.zeros(n, dtype=jnp.int32), jnp.zeros(n, dtype=bool),
        jnp.zeros(n, dtype=jnp.int32),
    )
    steps = 0
    while steps < max_steps:
        # clamp the tail so episodes get EXACTLY max_steps regardless of
        # segment granularity (a full trailing segment would grade MPC
        # under a laxer protocol than the other table rows)
        length = min(segment_len, max_steps - steps)
        carry = run_segment(carry, length)
        steps += length
        if bool(carry[2].all()):
            break
    _, _, done, dsum, dcnt, npass, nalive = carry
    dsum, dcnt = finalize_waypoint_counts(dsum, dcnt, thresh_div)
    return {
        "div_target_sum": dsum,
        "div_target_cnt": dcnt,
        "passed": npass,
        "steps_alive": nalive,
    }


def wing_point_metrics(roll, targets_n=None):
    """Aggregate wing waypoint metrics from a fly_to_point-contract rollout:
    mean/std per-episode target error (evaluate_fixed_wing.py:159-178) plus
    the pass rate (episodes that crossed the target's x before diverging).
    A diverged episode's error is its distance to the target at the
    divergence event; only episodes that never end within max_steps carry
    the flat thresh_div penalty."""
    dsum = np.asarray(roll["div_target_sum"])
    dcnt = np.asarray(roll["div_target_cnt"])
    if targets_n is not None:
        dsum, dcnt = dsum[:targets_n], dcnt[:targets_n]
    per_ep = dsum / dcnt
    steps = np.asarray(roll["steps_alive"])[: len(per_ep)]
    passed = np.asarray(roll["passed"])[: len(per_ep)]

    from apg_trajectory_tracking_tpu.evaluation.stats import (
        bootstrap_ci,
        wilson_ci,
    )

    n = int(len(per_ep))
    return {
        "mean_target_error": float(per_ep.mean()),
        "std_target_error": float(per_ep.std()),
        "pass_rate": float(passed.mean()),
        "mean_steps_alive": float(steps.mean()),
        "n": n,
        "pass_rate_ci": list(wilson_ci(int(passed.sum()), n)),
        "mean_target_error_ci": list(bootstrap_ci(per_ep)),
    }


def format_table(rows, columns, title=""):
    """Markdown table from {name: metrics-dict} rows.

    A column ``c`` whose row dict also carries ``f"{c}_ci"`` renders as
    ``value [lo, hi]`` (95% CI); ratio-like columns render as percent.
    If any row carries ``n``, an ``n`` column is appended so no ratio
    ships without its episode count.
    """
    ratio_like = ("ratio_stable", "pass_rate", "ratio_full")
    lines = []
    if title:
        lines.append(f"### {title}")
        lines.append("")
    has_n = any("n" in m for m in rows.values())
    cols = list(columns) + (["n"] if has_n else [])
    header = "| controller | " + " | ".join(cols) + " |"
    sep = "|" + "---|" * (len(cols) + 1)
    lines.append(header)
    lines.append(sep)
    for name, m in rows.items():
        cells = []
        for c in columns:
            v = m.get(c)
            ci = m.get(f"{c}_ci")
            if v is None:
                cells.append("—")
            elif ci is not None:
                from apg_trajectory_tracking_tpu.evaluation.stats import (
                    fmt_ci,
                )

                cells.append(fmt_ci(v, ci, pct=c in ratio_like))
            elif c in ratio_like:
                cells.append(f"{100 * v:.0f}%")
            else:
                cells.append(f"{v:.3f}")
        if has_n:
            cells.append(str(m.get("n", "—")))
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
    return "\n".join(lines)
