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

    def eval_sequences(params, key, state, actions):
        """actions: (pop, horizon, act_dim) -> (pop,) mean returns."""
        pop = actions.shape[0]
        N = pop * n_particles
        k_member, k_noise = jax.random.split(key)
        # TS1: each particle picks a random member per step
        members = jax.random.randint(k_member, (horizon, N), 0, ENSEMBLE)
        noise = jax.random.normal(k_noise, (horizon, N, state_dim))
        s0 = jnp.tile(state[None], (N, 1))

        def body(carry, inp):
            s, total = carry
            a, mem, eps = inp
            a_rep = jnp.repeat(a, n_particles, axis=0)  # (N, act)
            x = jnp.concatenate([s, a_rep], axis=-1)
            mean_all, logvar_all = _all_members(params, x)  # (E, N, sd)
            sel = mem[None, :, None]
            mean = jnp.take_along_axis(mean_all, sel, axis=0)[0]
            logvar = jnp.take_along_axis(logvar_all, sel, axis=0)[0]
            s_next = s + mean + jnp.exp(0.5 * logvar) * eps
            r = reward_fn(s_next, a_rep)
            return (s_next, total + r), None

        (_, total), _ = jax.lax.scan(
            body, (s0, jnp.zeros(N)), (
                jnp.swapaxes(actions, 0, 1), members, noise
            )
        )
        return jnp.mean(total.reshape(pop, n_particles), axis=1)

    @jax.jit
    def plan(params, key, state, prev_mean):
        mean0 = prev_mean
        std0 = jnp.ones_like(mean0) * 0.5 * (act_high - act_low) * 0.5

        def cem_iter(carry, k):
            mean, std = carry
            k1, k2 = jax.random.split(k)
            samples = mean + std * jax.random.normal(
                k1, (population,) + mean.shape
            )
            samples = jnp.clip(samples, act_low, act_high)
            returns = eval_sequences(params, k2, state, samples)
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


def cartpole_reward(state, action):
    """1 - |x_dot| while upright (rl_envs.py:105-110)."""
    upright = jnp.abs(state[..., 2]) < 0.21
    return jnp.where(upright, 1.0 - jnp.abs(state[..., 1]), 0.0)


def make_quad_hover_reward(target=jnp.array([0.0, 0.0, 3.0])):
    def reward(state, action):
        pos_div = jnp.linalg.norm(state[..., :3] - target, axis=-1)
        stable = jnp.all(jnp.abs(state[..., 3:5]) < 1.5, axis=-1)
        return jnp.where(stable, 0.3 - pos_div, -1.0)

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

    def act(self, state):
        self.key, k = jax.random.split(self.key)
        action, self.plan_mean = self.plan(
            self.model, k, jnp.asarray(state), self.plan_mean
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

    key, k = jax.random.split(key)
    state = np.asarray(reset_upright(k, 1)[0])
    rng = np.random.RandomState(seed)
    for _ in range(trial_length):
        a = rng.rand(1).astype(np.float32) * 2 - 1
        s2 = np.asarray(env_step(dyn, jnp.asarray(state), jnp.asarray(a), dt))
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
            s2 = np.asarray(
                env_step(dyn, jnp.asarray(state), jnp.asarray(a), dt)
            )
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


def eval_pets_balance(agent, dyn_params, starts, max_steps=250, dt=0.05,
                      thresh_div=0.21):
    """Balance-evaluator metrics (steps upright, mean |velocity|) for a
    trained PETS agent from given start states — the cartpole head-to-head
    protocol (every controller family starts from the same states)."""
    from apg_trajectory_tracking_tpu.envs.cartpole_env import env_step

    steps_list, vels = [], []
    for s0 in np.asarray(starts):
        agent.reset_plan()
        state = s0
        steps = 0
        for i in range(max_steps):
            a = agent.act(state)
            state = np.asarray(
                env_step(dyn_params, jnp.asarray(state), jnp.asarray(a), dt)
            )
            vels.append(abs(float(state[1])))
            # latch BEFORE the break so the falling step i still counts,
            # matching evaluate_balance / eval_cartpole_ppo_balance (a
            # break-first loop undercounts PETS by one step in the
            # head-to-head table)
            steps = i
            if abs(state[2]) >= thresh_div:
                break
        steps_list.append(steps)
    return {
        "mean_vel": float(np.mean(vels)),
        "mean_stable": float(np.mean(steps_list)),
        "std_stable": float(np.std(steps_list)),
    }
