"""Pure-JAX PETS baseline: probabilistic ensemble + CEM planning.

Replaces the reference's mbrl-lib PETS (``baselines/pets_baseline.py``:
GaussianMLP ensemble of 5, CEM planner with horizon 15, trials of 200
steps). Everything is jitted: ensemble training is a scan over bootstrapped
minibatches; one CEM planning step (5 iterations x population 350 x
horizon 15 x 20 particles with TS1 ensemble sampling) is a single XLA
program, so receding-horizon planning is fast enough to run thousands of
env steps.

The planner operates on the raw dynamical state (4/12-dim) with the
per-system reward functions below, rather than mbrl's observation wrappers —
the same MDP, minus the history/obs plumbing.
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from apg_trajectory_tracking_tpu.models.common import linear_init

ENSEMBLE = 5
HIDDEN = 200


class EnsembleParams(NamedTuple):
    l1: tuple
    l2: tuple
    out_mean: tuple
    out_logvar: tuple
    min_logvar: jnp.ndarray
    max_logvar: jnp.ndarray


def init_ensemble(key, state_dim, act_dim):
    in_dim = state_dim + act_dim

    def member(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return (
            linear_init(k1, in_dim, HIDDEN),
            linear_init(k2, HIDDEN, HIDDEN),
            linear_init(k3, HIDDEN, state_dim),
            linear_init(k4, HIDDEN, state_dim),
        )

    members = [member(k) for k in jax.random.split(key, ENSEMBLE)]
    stack = lambda i: tuple(
        jnp.stack([m[i][j] for m in members]) for j in range(2)
    )
    return EnsembleParams(
        l1=stack(0),
        l2=stack(1),
        out_mean=stack(2),
        out_logvar=stack(3),
        min_logvar=jnp.full((state_dim,), -10.0),
        max_logvar=jnp.full((state_dim,), 0.5),
    )


def _member_forward(params: EnsembleParams, m, x):
    """Forward one ensemble member m on inputs x (..., in_dim) ->
    (delta_mean, logvar)."""
    w, b = params.l1[0][m], params.l1[1][m]
    h = jax.nn.silu(x @ w + b)
    w, b = params.l2[0][m], params.l2[1][m]
    h = jax.nn.silu(h @ w + b)
    wm, bm = params.out_mean[0][m], params.out_mean[1][m]
    mean = h @ wm + bm
    wv, bv = params.out_logvar[0][m], params.out_logvar[1][m]
    logvar = h @ wv + bv
    logvar = params.max_logvar - jax.nn.softplus(params.max_logvar - logvar)
    logvar = params.min_logvar + jax.nn.softplus(logvar - params.min_logvar)
    return mean, logvar


def make_model_trainer(state_dim, act_dim, lr=1e-3, batch_size=256):
    optimizer = optax.adam(lr)

    def nll_loss(params, states, actions, next_states):
        x = jnp.concatenate([states, actions], axis=-1)
        target = next_states - states

        def member_loss(m):
            mean, logvar = _member_forward(params, m, x)
            inv_var = jnp.exp(-logvar)
            return jnp.mean(
                jnp.sum((mean - target) ** 2 * inv_var + logvar, axis=-1)
            )

        losses = jax.vmap(member_loss)(jnp.arange(ENSEMBLE))
        reg = 0.01 * (
            jnp.sum(params.max_logvar) - jnp.sum(params.min_logvar)
        )
        return jnp.sum(losses) + reg

    @partial(jax.jit, static_argnames=("n_batches",))
    def train(params, opt_state, key, states, actions, next_states, n_batches):
        n = states.shape[0]

        def body(carry, k):
            params, opt_state = carry
            idx = jax.random.randint(k, (batch_size,), 0, n)
            loss, grads = jax.value_and_grad(nll_loss)(
                params, states[idx], actions[idx], next_states[idx]
            )
            updates, opt_state = optimizer.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jax.random.split(key, n_batches)
        )
        return params, opt_state, jnp.mean(losses)

    def init_opt(params):
        return optimizer.init(params)

    return train, init_opt


def make_cem_planner(
    reward_fn,
    state_dim,
    act_dim,
    act_low,
    act_high,
    horizon=15,
    n_iters=5,
    population=350,
    n_elites=35,
    n_particles=20,
):
    """CEM over action sequences, evaluated with TS1 ensemble propagation."""
    act_low = jnp.asarray(act_low, jnp.float32)
    act_high = jnp.asarray(act_high, jnp.float32)

    def _all_members(params, x):
        """Forward ALL members on a flat batch: x (N, in) ->
        (E, N, state_dim) x2. Dense batched matmuls (MXU-friendly) instead
        of per-particle parameter gathers."""
        w, b = params.l1
        h = jax.nn.silu(jnp.einsum("nj,eji->eni", x, w) + b[:, None])
        w, b = params.l2
        h = jax.nn.silu(jnp.einsum("enj,eji->eni", h, w) + b[:, None])
        wm, bm = params.out_mean
        mean = jnp.einsum("enj,eji->eni", h, wm) + bm[:, None]
        wv, bv = params.out_logvar
        logvar = jnp.einsum("enj,eji->eni", h, wv) + bv[:, None]
        logvar = params.max_logvar - jax.nn.softplus(
            params.max_logvar - logvar
        )
        logvar = params.min_logvar + jax.nn.softplus(
            logvar - params.min_logvar
        )
        return mean, logvar

    def eval_sequences(params, key, state, actions, ctx):
        """actions: (pop, horizon, act_dim) -> (pop,) mean returns.
        ``ctx``: (horizon, d) per-step reward context (e.g. the upcoming
        reference rows for quad tracking, the target for the wing);
        (horizon, 0) when the reward needs none."""
        pop = actions.shape[0]
        N = pop * n_particles
        k_member, k_noise = jax.random.split(key)
        # TS1: each particle picks a random member per step
        members = jax.random.randint(k_member, (horizon, N), 0, ENSEMBLE)
        noise = jax.random.normal(k_noise, (horizon, N, state_dim))
        s0 = jnp.tile(state[None], (N, 1))

        def body(carry, inp):
            s, total = carry
            a, mem, eps, ctx_row = inp
            a_rep = jnp.repeat(a, n_particles, axis=0)  # (N, act)
            x = jnp.concatenate([s, a_rep], axis=-1)
            mean_all, logvar_all = _all_members(params, x)  # (E, N, sd)
            sel = mem[None, :, None]
            mean = jnp.take_along_axis(mean_all, sel, axis=0)[0]
            logvar = jnp.take_along_axis(logvar_all, sel, axis=0)[0]
            s_next = s + mean + jnp.exp(0.5 * logvar) * eps
            r = reward_fn(s_next, a_rep, ctx_row)
            return (s_next, total + r), None

        (_, total), _ = jax.lax.scan(
            body, (s0, jnp.zeros(N)), (
                jnp.swapaxes(actions, 0, 1), members, noise, ctx
            )
        )
        return jnp.mean(total.reshape(pop, n_particles), axis=1)

    @jax.jit
    def plan(params, key, state, prev_mean, ctx):
        mean0 = prev_mean
        std0 = jnp.ones_like(mean0) * 0.5 * (act_high - act_low) * 0.5

        def cem_iter(carry, k):
            mean, std = carry
            k1, k2 = jax.random.split(k)
            samples = mean + std * jax.random.normal(
                k1, (population,) + mean.shape
            )
            samples = jnp.clip(samples, act_low, act_high)
            returns = eval_sequences(params, k2, state, samples, ctx)
            elite_idx = jnp.argsort(-returns)[:n_elites]
            elites = samples[elite_idx]
            new_mean = 0.9 * jnp.mean(elites, axis=0) + 0.1 * mean
            new_std = 0.9 * jnp.std(elites, axis=0) + 0.1 * std
            return (new_mean, new_std), returns[elite_idx[0]]

        (mean, _), _ = jax.lax.scan(
            cem_iter, (mean0, std0), jax.random.split(key, n_iters)
        )
        action = mean[0]
        next_mean = jnp.concatenate([mean[1:], mean[-1:]], axis=0)
        return action, next_mean

    return plan


# ---------------------------------------------------------------------------
# per-system reward functions on raw states (matching the RL env rewards)
# ---------------------------------------------------------------------------


def cartpole_reward(state, action, ctx=None):
    """1 - |x_dot| while upright (rl_envs.py:105-110)."""
    upright = jnp.abs(state[..., 2]) < 0.21
    return jnp.where(upright, 1.0 - jnp.abs(state[..., 1]), 0.0)


def make_quad_hover_reward(target=jnp.array([0.0, 0.0, 3.0])):
    def reward(state, action, ctx=None):
        pos_div = jnp.linalg.norm(state[..., :3] - target, axis=-1)
        stable = jnp.all(jnp.abs(state[..., 3:5]) < 1.5, axis=-1)
        return jnp.where(stable, 0.3 - pos_div, -1.0)

    return reward


def make_quad_tracking_reward(thresh_div=0.3, thresh_stable=1.5):
    """The quad RL tracking reward on raw states: mario shaping
    (rl_envs.py:257-308, the reference PETS quad's intent — its
    ``reward_fns.quad`` comes from a patched mbrl and mirrors the env's
    reward) with the env's done conditions as a planning penalty.

    ``ctx`` = the (9,) reference row for the planned step."""

    def reward(state, action01, ref_row):
        # sum of SQUARED errors. The env reward (and the reference's
        # get_reward_mario, rl_envs.py:279-281) squares the SUM, letting
        # opposite-sign axis errors cancel — tolerable as a training
        # signal, but as the CEM objective it would actively reward
        # canceling-axis rollouts over genuinely closer ones.
        pos_loss = jnp.sum((ref_row[:3] - state[..., :3]) ** 2, axis=-1)
        ori_loss = jnp.sum((ref_row[3:6] - state[..., 3:6]) ** 2, axis=-1)
        vel_loss = jnp.sum((ref_row[6:9] - state[..., 6:9]) ** 2, axis=-1)
        act_reward = -0.001 * jnp.sum((0.5 - action01) ** 2, axis=-1)
        mario = (
            -0.02 * (pos_loss - 2.0)
            - 0.01 * (ori_loss - 0.2)
            - 0.002 * (vel_loss - 2.0)
            + 0.1
            + act_reward
        )
        pos_div = jnp.linalg.norm(ref_row[:3] - state[..., :3], axis=-1)
        alive = jnp.all(
            jnp.abs(state[..., 3:5]) < thresh_stable, axis=-1
        ) & (pos_div < thresh_div)
        return jnp.where(alive, mario, -1.0)

    return reward


def make_wing_pets_reward(thresh_div=4.0, thresh_stable=0.5):
    """The wing RL reward on raw states: thresh_div - divergence from the
    origin->target line while stable (rl_envs.make_wing_rl; the reference
    PETS wing env is WingEnvRL, pets_baseline.py:45-53).

    ``ctx`` = the (3,) target waypoint."""

    def reward(state, action, target):
        pos = state[..., :3]
        # projection of pos onto the origin->target line, batched
        t = (pos @ target) / jnp.maximum(target @ target, 1e-9)
        on_line = t[..., None] * target
        div = jnp.linalg.norm(on_line - pos, axis=-1)
        stable = jnp.all(jnp.abs(state[..., 6:8]) < thresh_stable, axis=-1)
        return jnp.where(stable, thresh_div - div, -thresh_div)

    return reward


class PETS:
    """Trial-based PETS agent for a functional env over raw states."""

    def __init__(
        self, state_dim, act_dim, reward_fn, act_low, act_high,
        horizon=15, seed=0, **planner_kwargs,
    ):
        self.state_dim, self.act_dim = state_dim, act_dim
        self.horizon = horizon
        key = jax.random.PRNGKey(seed)
        self.key, k_model = jax.random.split(key)
        self.model = init_ensemble(k_model, state_dim, act_dim)
        self.train_fn, init_opt = make_model_trainer(state_dim, act_dim)
        self.opt_state = init_opt(self.model)
        self.plan = make_cem_planner(
            reward_fn, state_dim, act_dim, act_low, act_high, horizon,
            **planner_kwargs,
        )
        self.act_low, self.act_high = act_low, act_high
        self.buffer = {"s": [], "a": [], "s2": []}
        self.plan_mean = jnp.zeros((horizon, act_dim))

    def reset_plan(self):
        self.plan_mean = jnp.zeros((self.horizon, self.act_dim))

    def act(self, state, ctx=None):
        """``ctx``: optional (horizon, d) per-step reward context (ref
        window rows / target); contextless rewards get (horizon, 0)."""
        if ctx is None:
            ctx = jnp.zeros((self.horizon, 0), jnp.float32)
        self.key, k = jax.random.split(self.key)
        action, self.plan_mean = self.plan(
            self.model, k, jnp.asarray(state), self.plan_mean,
            jnp.asarray(ctx),
        )
        return np.asarray(action)

    def record(self, s, a, s2):
        self.buffer["s"].append(np.asarray(s))
        self.buffer["a"].append(np.asarray(a))
        self.buffer["s2"].append(np.asarray(s2))

    def train_model(self, n_batches=100):
        s = jnp.asarray(np.array(self.buffer["s"], dtype=np.float32))
        a = jnp.asarray(np.array(self.buffer["a"], dtype=np.float32))
        s2 = jnp.asarray(np.array(self.buffer["s2"], dtype=np.float32))
        self.key, k = jax.random.split(self.key)
        self.model, self.opt_state, loss = self.train_fn(
            self.model, self.opt_state, k, s, a, s2, n_batches
        )
        return float(loss)


def run_pets_cartpole(trials=200, trial_length=200, seed=0, dt=0.05,
                      verbose=True, on_trial=None):
    """The reference's PETS cartpole protocol (pets_baseline.py:63-65,
    156-162, 255-330): one random-action exploration trial, then
    ``trials`` trials of (train ensemble -> plan with CEM each step),
    episode break when the pole leaves the upright band.

    Returns (agent, rewards_per_trial). The reference budget is 200 trials
    of 200 steps.
    """
    from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_params
    from apg_trajectory_tracking_tpu.envs.cartpole_env import (
        env_step,
        reset_upright,
    )

    dyn = cartpole_params()
    agent = PETS(
        state_dim=4, act_dim=1, reward_fn=cartpole_reward,
        act_low=-1.0, act_high=1.0, seed=seed, horizon=10,
        population=150, n_elites=15, n_particles=5, n_iters=5,
    )
    key = jax.random.PRNGKey(seed)
    # single compiled dispatch per step (see run_pets_wing's _step1 note)
    _step1 = jax.jit(lambda s, a: env_step(dyn, s, a, dt))

    key, k = jax.random.split(key)
    state = np.asarray(reset_upright(k, 1)[0])
    rng = np.random.RandomState(seed)
    for _ in range(trial_length):
        a = rng.rand(1).astype(np.float32) * 2 - 1
        s2 = np.asarray(_step1(jnp.asarray(state), jnp.asarray(a)))
        agent.record(state, a, s2)
        state = s2
        if abs(state[2]) > 1.0:
            key, k = jax.random.split(key)
            state = np.asarray(reset_upright(k, 1)[0])

    rewards_per_trial = []
    for trial in range(trials):
        loss = agent.train_model(n_batches=200)
        key, k = jax.random.split(key)
        state = np.asarray(reset_upright(k, 1)[0])
        agent.reset_plan()
        total, step_i = 0.0, 0
        for step_i in range(trial_length):
            a = agent.act(state)
            s2 = np.asarray(_step1(jnp.asarray(state), jnp.asarray(a)))
            agent.record(state, a, s2)
            upright = bool(np.abs(s2[2]) < 0.21)
            total += (1.0 - abs(float(s2[1]))) if upright else 0.0
            state = s2
            if not upright:
                break
        rewards_per_trial.append(total)
        if verbose:
            print(f"trial {trial}: reward {total:.1f} steps {step_i + 1} "
                  f"model loss {loss:.2f}")
        if on_trial is not None:
            # periodic persistence hook (long runs survive interruption)
            on_trial(trial, agent, rewards_per_trial)
    return agent, rewards_per_trial


def run_pets_wing(trials=50, trial_length=200, seed=0, dt=0.05,
                  thresh_div=4.0, thresh_stable=0.5, verbose=True,
                  on_trial=None):
    """PETS on the fixed-wing fly-to-point task — the reference PETS
    script's DEFAULT system (pets_baseline.py:22,45-53: WingEnvRL). One
    random-action exploration trial around the data-sampler's action prior
    (wing_env.py:72-95), then ``trials`` trials of (train ensemble -> CEM
    plan per step); episodes end on target pass / divergence from the
    origin->target line / instability, like make_wing_rl.

    Returns (agent, history) with history = {"rewards": per-trial summed
    env reward, "target_errors": per-trial final waypoint error (None if
    the episode never passed the target)}.
    """
    from apg_trajectory_tracking_tpu.dynamics.fixed_wing import (
        wing_params,
        wing_step,
    )

    dyn = wing_params({})
    agent = PETS(
        state_dim=12, act_dim=4,
        reward_fn=make_wing_pets_reward(thresh_div, thresh_stable),
        act_low=0.0, act_high=1.0, seed=seed, horizon=10,
        population=150, n_elites=15, n_particles=5, n_iters=5,
    )
    rng = np.random.RandomState(seed)

    def new_target():
        return np.array(
            [50.0, (rng.rand() - 0.5) * 10, (rng.rand() - 0.5) * 10],
            np.float32,
        )

    def reset_state():
        s = np.zeros(12, np.float32)
        s[3] = 11.5  # level flight (wing_env.py:26-28)
        return s

    # one compiled dispatch per env step: the un-jitted step fn would
    # issue every jnp op as its own device round trip, which is ruinous
    # through the tunneled-TPU harness (~50 ops x RTT per step)
    _step1 = jax.jit(lambda s, a: wing_step(dyn, s[None], a[None], dt)[0])

    def env_step(state, a):
        return np.asarray(_step1(jnp.asarray(state), jnp.asarray(a)))

    def status(state, target):
        pos = state[:3]
        t = float(pos @ target) / max(float(target @ target), 1e-9)
        div = float(np.linalg.norm(t * target - pos))
        passed = bool(pos[0] > target[0])
        unstable = not bool(np.all(np.abs(state[6:8]) < thresh_stable))
        return passed or unstable or div > thresh_div, div, passed

    state, target = reset_state(), new_target()
    for _ in range(trial_length):
        a = np.clip(
            np.array([0.25, 0.5, 0.5, 0.5]) + (rng.rand(4) - 0.5) * 0.5,
            0.0, 1.0,
        ).astype(np.float32)
        s2 = env_step(state, a)
        agent.record(state, a, s2)
        state = s2
        if status(state, target)[0]:
            state, target = reset_state(), new_target()

    history = {"rewards": [], "target_errors": []}
    for trial in range(trials):
        loss = agent.train_model(n_batches=200)
        state, target = reset_state(), new_target()
        ctx = np.tile(target, (agent.horizon, 1)).astype(np.float32)
        agent.reset_plan()
        total, final_err, step_i = 0.0, None, 0
        for step_i in range(trial_length):
            a = agent.act(state, ctx)
            prev = state
            state = env_step(state, a)
            agent.record(prev, a, state)
            done, div, passed = status(state, target)
            if not done:
                total += thresh_div - div  # make_wing_rl reward
            else:
                if passed:
                    # waypoint error: distance of the target to the passed
                    # segment (evaluate_fixed_wing.py:159-178)
                    seg = state[:3] - prev[:3]
                    t = np.clip(
                        float((target - prev[:3]) @ seg)
                        / max(float(seg @ seg), 1e-9), 0.0, 1.0,
                    )
                    final_err = float(
                        np.linalg.norm(prev[:3] + t * seg - target)
                    )
                break
        history["rewards"].append(total)
        history["target_errors"].append(final_err)
        if verbose:
            err = "—" if final_err is None else f"{final_err:.3f}"
            print(f"trial {trial}: reward {total:.1f} steps {step_i + 1} "
                  f"target_err {err} model loss {loss:.2f}")
        if on_trial is not None:
            on_trial(trial, agent, history)
    return agent, history


def run_pets_quad(trials=50, trial_length=200, seed=0, dt=0.1, speed=0.2,
                  horizon=10, thresh_div=0.3, thresh_stable=1.5,
                  data_dir="data/traj_data", verbose=True, on_trial=None):
    """PETS on quad trajectory tracking — the reference quad PETS setup
    (pets_baseline.py:34-44: QuadEnvRL at dt 0.1, speed 0.2). The ensemble
    models the 12-dim raw state (Markov — unlike the reference, whose
    mbrl wrapper is forced to model the 105-dim env observation); the CEM
    planner's per-step reward context is the upcoming reference window.

    Returns (agent, history) with history = {"rewards": per-trial summed
    mario reward, "divergences": per-trial mean tracking divergence,
    "steps": per-trial steps survived}.
    """
    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.trajectory.generate import (
        ensure_trajectory_bank,
        load_trajectory_bank,
        prepare_trajectory,
    )

    bank = load_trajectory_bank(ensure_trajectory_bank(data_dir))
    prepared = np.stack(
        [prepare_trajectory(t, dt, speed) for t in bank[:64]]
    ).astype(np.float32)
    T = prepared.shape[1]
    dyn = quad_params()
    reward_fn = make_quad_tracking_reward(thresh_div, thresh_stable)
    agent = PETS(
        state_dim=12, act_dim=4, reward_fn=reward_fn,
        act_low=0.0, act_high=1.0, seed=seed, horizon=horizon,
        population=150, n_elites=15, n_particles=5, n_iters=5,
    )
    rng = np.random.RandomState(seed)

    # single compiled dispatch per step (see run_pets_wing's _step1 note)
    _step1 = jax.jit(lambda s, a: quad_step(dyn, s[None], a[None], dt)[0])

    def env_step(state, a):
        return np.asarray(_step1(jnp.asarray(state), jnp.asarray(a)))

    def reset_episode():
        ti = rng.randint(len(prepared))
        s = np.zeros(12, np.float32)
        s[:3] = prepared[ti, 0, :3]
        return ti, 0, s

    def ref_window(ti, ind):
        idx = np.minimum(ind + 1 + np.arange(horizon), T - 1)
        return prepared[ti][idx]

    def done_of(state, ti, ind):
        ref_row = prepared[ti, min(ind, T - 1)]
        pos_div = float(np.linalg.norm(ref_row[:3] - state[:3]))
        unstable = not bool(np.all(np.abs(state[3:5]) < thresh_stable))
        return (
            unstable or pos_div > thresh_div or ind > T - horizon - 2,
            pos_div,
        )

    ti, ind, state = reset_episode()
    for _ in range(trial_length):
        # hover-biased random exploration (the quad falls instantly under
        # uniform actions, leaving the ensemble with no on-trajectory data)
        a = np.clip(0.5 + (rng.rand(4) - 0.5) * 0.4, 0.0, 1.0).astype(
            np.float32
        )
        s2 = env_step(state, a)
        agent.record(state, a, s2)
        state, ind = s2, ind + 1
        if done_of(state, ti, ind)[0]:
            ti, ind, state = reset_episode()

    history = {"rewards": [], "divergences": [], "steps": []}
    for trial in range(trials):
        loss = agent.train_model(n_batches=200)
        ti, ind, state = reset_episode()
        agent.reset_plan()
        total, divs = 0.0, []
        step_i = 0
        for step_i in range(trial_length):
            ctx = ref_window(ti, ind)
            a = agent.act(state, ctx)
            prev = state
            state = env_step(state, a)
            agent.record(prev, a, state)
            ind += 1
            done, pos_div = done_of(state, ti, ind)
            divs.append(pos_div)
            if done:
                break
            total += float(
                reward_fn(jnp.asarray(state), jnp.asarray(a),
                          jnp.asarray(prepared[ti, min(ind, T - 1)]))
            )
        history["rewards"].append(total)
        history["divergences"].append(float(np.mean(divs)))
        history["steps"].append(step_i + 1)
        if verbose:
            print(f"trial {trial}: reward {total:.2f} steps {step_i + 1} "
                  f"mean_div {np.mean(divs):.3f} model loss {loss:.2f}")
        if on_trial is not None:
            on_trial(trial, agent, history)
    return agent, history


def eval_pets_wing_waypoints(agent, dyn_params, targets, thresh_div=10.0,
                             thresh_stable=3.0, max_steps=1000, dt=0.05,
                             seed=0):
    """Fly a trained wing PETS agent to shared waypoints under the wing
    head-to-head protocol (wing_eval.fly_to_point test-time semantics:
    x-crossing pass, target-to-passed-segment metric, break on
    divergence/instability). All episodes plan in lockstep — one vmapped
    CEM plan per control step — and the loop exits when every episode has
    ended. Returns the fly_to_point contract so wing_point_metrics applies.
    """
    from apg_trajectory_tracking_tpu.dynamics.fixed_wing import wing_step
    from apg_trajectory_tracking_tpu.evaluation.wing_eval import (
        DES_SPEED,
        finalize_waypoint_counts,
        waypoint_step_events,
    )

    targets = jnp.asarray(targets, jnp.float32)
    n = targets.shape[0]
    state0 = jnp.zeros((n, 12), jnp.float32).at[:, 3].set(DES_SPEED)
    line_start0 = state0[:, :3]
    ctx = jnp.tile(targets[:, None, :], (1, agent.horizon, 1))
    v_plan = jax.vmap(agent.plan, in_axes=(None, 0, 0, 0, 0))

    @jax.jit
    def advance(model, keys, state, plan_mean, done, dsum, dcnt, npass,
                nalive):
        actions, plan_mean = v_plan(model, keys, state, plan_mean, ctx)
        new_state = wing_step(dyn_params, state, actions, dt)
        next_state, new_done, dsum, dcnt, npass, active = (
            waypoint_step_events(
                state, new_state, targets, line_start0, done, dsum, dcnt,
                npass, thresh_div, thresh_stable,
            )
        )
        nalive = nalive + active.astype(jnp.int32)
        return next_state, plan_mean, new_done, dsum, dcnt, npass, nalive

    key = jax.random.PRNGKey(seed)
    state = state0
    plan_mean = jnp.zeros((n, agent.horizon, agent.act_dim))
    done = jnp.zeros(n, bool)
    dsum, dcnt = jnp.zeros(n), jnp.zeros(n, jnp.int32)
    npass = jnp.zeros(n, bool)
    nalive = jnp.zeros(n, jnp.int32)
    for _ in range(max_steps):
        key, k = jax.random.split(key)
        state, plan_mean, done, dsum, dcnt, npass, nalive = advance(
            agent.model, jax.random.split(k, n), state, plan_mean, done,
            dsum, dcnt, npass, nalive,
        )
        if bool(done.all()):
            break
    dsum, dcnt = finalize_waypoint_counts(dsum, dcnt, thresh_div)
    return {
        "div_target_sum": dsum,
        "div_target_cnt": dcnt,
        "passed": npass,
        "steps_alive": nalive,
    }


def eval_pets_balance(agent, dyn_params, starts, max_steps=250, dt=0.05,
                      thresh_div=0.21):
    """Balance-evaluator metrics (steps upright, mean |velocity|) for a
    trained PETS agent from given start states — the cartpole head-to-head
    protocol (every controller family starts from the same states)."""
    from apg_trajectory_tracking_tpu.envs.cartpole_env import env_step

    # single compiled dispatch per step (see run_pets_wing's _step1 note)
    _step1 = jax.jit(lambda s, a: env_step(dyn_params, s, a, dt))
    steps_list, vels = [], []
    for s0 in np.asarray(starts):
        agent.reset_plan()
        state = s0
        steps = 0
        for i in range(max_steps):
            a = agent.act(state)
            state = np.asarray(_step1(jnp.asarray(state), jnp.asarray(a)))
            vels.append(abs(float(state[1])))
            # latch BEFORE the break so the falling step i still counts,
            # matching evaluate_balance / eval_cartpole_ppo_balance (a
            # break-first loop undercounts PETS by one step in the
            # head-to-head table)
            steps = i
            if abs(state[2]) >= thresh_div:
                break
        steps_list.append(steps)
    from apg_trajectory_tracking_tpu.evaluation.stats import (
        steps_balance_summary,
    )

    m = {
        "mean_vel": float(np.mean(vels)),
        "mean_stable": float(np.mean(steps_list)),
        "std_stable": float(np.std(steps_list)),
    }
    m.update(steps_balance_summary(steps_list))
    return m


def eval_pets_quad_tracking(agent, dyn_params, references, ref_len,
                            thresh_div=1.0, thresh_stable=1.0,
                            max_steps=251, dt=0.1, seed=0):
    """Track a batch of prepared reference trajectories with a trained quad
    PETS agent under the head-to-head test protocol — the exact semantics of
    ``quad_eval.follow_trajectories(test_time=True)``: start on the first
    reference point, divergence measured against ref[i+1], break (freeze)
    on divergence > thresh_div or attitude instability.

    All episodes plan in lockstep (one vmapped CEM plan per control step,
    like ``eval_pets_wing_waypoints``); the per-step planning context is the
    same ``array_ref_window`` every neural row consumes. Returns a dict with
    (n, max_steps) ``divergences``/``valid`` so ``metrics_from_rollout``
    produces the identical metric columns as every other table row.
    """
    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_is_stable,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.trajectory.refs import array_ref_window

    refs = jnp.asarray(references, jnp.float32)
    n, T = refs.shape[0], refs.shape[1]
    state0 = jnp.zeros((n, 12), jnp.float32).at[:, :3].set(refs[:, 0, :3])
    v_plan = jax.vmap(agent.plan, in_axes=(None, 0, 0, 0, 0))

    @jax.jit
    def advance(model, keys, i, state, plan_mean, done):
        ctx = jax.vmap(
            lambda r: array_ref_window(r, i, agent.horizon)
        )(refs)
        actions, plan_mean = v_plan(model, keys, state, plan_mean, ctx)
        new_state = quad_step(dyn_params, state, actions, dt)
        stable = quad_is_stable(new_state, thresh_stable)
        proj = refs[:, jnp.minimum(i + 1, T - 1), :3]
        div = jnp.linalg.norm(proj - new_state[:, :3], axis=1)
        diverged = jnp.logical_or(div > thresh_div, ~stable)
        step_valid = jnp.logical_and(~done, i <= ref_len)
        new_done = jnp.logical_or(done, diverged)
        next_state = jnp.where(done[:, None], state, new_state)
        return next_state, plan_mean, new_done, div, step_valid

    key = jax.random.PRNGKey(seed)
    state = state0
    plan_mean = jnp.zeros((n, agent.horizon, agent.act_dim))
    done = jnp.zeros(n, bool)
    divs = np.zeros((n, max_steps), np.float32)
    valid = np.zeros((n, max_steps), bool)
    for i in range(max_steps):
        key, k = jax.random.split(key)
        state, plan_mean, done, div, step_valid = advance(
            agent.model, jax.random.split(k, n), i, state, plan_mean, done,
        )
        divs[:, i] = np.asarray(div)
        valid[:, i] = np.asarray(step_valid)
        if bool(done.all()):
            break
    return {"divergences": divs, "valid": valid}
