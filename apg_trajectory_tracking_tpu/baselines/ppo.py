"""Pure-JAX PPO baseline over vectorized environments.

Replaces the reference's stable-baselines3 PPO (``baselines/ppo_baseline.py``
— single CPU env, MlpPolicy) with a fully jitted implementation: N
environments step in lockstep (vmap), rollouts are ``lax.scan``s, and each
train iteration (rollout + GAE + minibatch epochs) is one XLA program.

Hyperparameters follow SB3's defaults used by the reference: 64x64 tanh
actor-critic, Adam 3e-4, gamma 0.99, GAE lambda 0.95, clip 0.2, 10 epochs,
value coefficient 0.5, entropy coefficient 0.0, state-independent log-std.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from apg_trajectory_tracking_tpu.models.common import linear_init


class ActorCritic(NamedTuple):
    pi: dict
    v: dict
    log_std: jnp.ndarray


def init_actor_critic(key, obs_dim, act_dim, hidden=64):
    keys = jax.random.split(key, 6)

    def mlp(ks, out_dim):
        return {
            "l1": linear_init(ks[0], obs_dim, hidden),
            "l2": linear_init(ks[1], hidden, hidden),
            "out": linear_init(ks[2], hidden, out_dim),
        }

    return ActorCritic(
        pi=mlp(keys[:3], act_dim),
        v=mlp(keys[3:], 1),
        log_std=jnp.zeros(act_dim),
    )


def _mlp_apply(params, x):
    for name in ("l1", "l2"):
        w, b = params[name]
        x = jnp.tanh(x @ w + b)
    w, b = params["out"]
    return x @ w + b


def policy_mean(params: ActorCritic, obs):
    return _mlp_apply(params.pi, obs)


def value(params: ActorCritic, obs):
    return _mlp_apply(params.v, obs)[..., 0]


def _log_prob(mean, log_std, action):
    var = jnp.exp(2 * log_std)
    return jnp.sum(
        -0.5 * ((action - mean) ** 2 / var + 2 * log_std + jnp.log(2 * jnp.pi)),
        axis=-1,
    )


class PPOConfig(NamedTuple):
    n_envs: int = 16
    n_steps: int = 128
    n_epochs: int = 10
    n_minibatches: int = 8
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    lr: float = 3e-4
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    max_grad_norm: float = 0.5
    act_low: float = -1.0
    act_high: float = 1.0


def make_ppo(reset_fn, step_fn, obs_dim, act_dim, cfg: PPOConfig):
    """Build (init_state, train_iter) for a functional env.

    ``reset_fn(key) -> (env_state, obs)``;
    ``step_fn(env_state, action, key) -> (env_state, obs, reward, done)``.
    """
    optimizer = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr),
    )
    v_reset = jax.vmap(reset_fn)
    v_step = jax.vmap(step_fn)

    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        params = init_actor_critic(k2, obs_dim, act_dim)
        env_states, obs = v_reset(jax.random.split(k1, cfg.n_envs))
        return {
            "params": params,
            "opt_state": optimizer.init(params),
            "env_states": env_states,
            "obs": obs,
            "key": k3,
        }

    def _rollout(params, env_states, obs, key):
        def body(carry, _):
            env_states, obs, key = carry
            key, k_act, k_env = jax.random.split(key, 3)
            mean = policy_mean(params, obs)
            std = jnp.exp(params.log_std)
            action = mean + std * jax.random.normal(k_act, mean.shape)
            logp = _log_prob(mean, params.log_std, action)
            clipped = jnp.clip(action, cfg.act_low, cfg.act_high)
            v = value(params, obs)
            env_states, next_obs, reward, done = v_step(
                env_states, clipped, jax.random.split(k_env, cfg.n_envs)
            )
            out = (obs, action, logp, v, reward, done)
            return (env_states, next_obs, key), out

        (env_states, obs, key), traj = jax.lax.scan(
            body, (env_states, obs, key), None, length=cfg.n_steps
        )
        return env_states, obs, key, traj

    def _gae(v_traj, rewards, dones, last_v):
        def body(carry, inp):
            gae, next_v = carry
            v, r, d = inp
            nd = 1.0 - d.astype(jnp.float32)
            delta = r + cfg.gamma * next_v * nd - v
            gae = delta + cfg.gamma * cfg.gae_lambda * nd * gae
            return (gae, v), gae

        (_, _), advs = jax.lax.scan(
            body,
            (jnp.zeros_like(last_v), last_v),
            (v_traj, rewards, dones),
            reverse=True,
        )
        return advs

    def _update(params, opt_state, batch, key):
        obs, actions, logp_old, advs, returns = batch
        n = obs.shape[0]
        mb_size = n // cfg.n_minibatches

        def epoch(carry, k):
            params, opt_state = carry
            perm = jax.random.permutation(k, n)

            def minibatch(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb_size, mb_size)

                def loss_fn(p):
                    mean = policy_mean(p, obs[idx])
                    logp = _log_prob(mean, p.log_std, actions[idx])
                    ratio = jnp.exp(logp - logp_old[idx])
                    a = advs[idx]
                    a = (a - a.mean()) / (a.std() + 1e-8)
                    pg = -jnp.mean(
                        jnp.minimum(
                            ratio * a,
                            jnp.clip(
                                ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps
                            ) * a,
                        )
                    )
                    v = value(p, obs[idx])
                    v_loss = jnp.mean((v - returns[idx]) ** 2)
                    entropy = jnp.sum(
                        p.log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e)
                    )
                    return (
                        pg + cfg.vf_coef * v_loss - cfg.ent_coef * entropy
                    )

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = optimizer.update(grads, opt_state)
                return (optax.apply_updates(params, updates), opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                minibatch, (params, opt_state), jnp.arange(cfg.n_minibatches)
            )
            return (params, opt_state), jnp.mean(losses)

        (params, opt_state), losses = jax.lax.scan(
            epoch, (params, opt_state), jax.random.split(key, cfg.n_epochs)
        )
        return params, opt_state, jnp.mean(losses)

    @jax.jit
    def train_iter(state):
        params = state["params"]
        key, k_roll, k_upd = jax.random.split(state["key"], 3)
        env_states, obs, _, traj = _rollout(
            params, state["env_states"], state["obs"], k_roll
        )
        t_obs, t_act, t_logp, t_v, t_rew, t_done = traj
        last_v = value(params, obs)
        advs = _gae(t_v, t_rew, t_done, last_v)
        returns = advs + t_v

        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        batch = (
            flat(t_obs), flat(t_act), flat(t_logp), flat(advs), flat(returns)
        )
        params, opt_state, loss = _update(
            params, state["opt_state"], batch, k_upd
        )
        metrics = {
            "loss": loss,
            "mean_reward": jnp.mean(t_rew),
            "mean_episode_len": 1.0 / jnp.maximum(jnp.mean(
                t_done.astype(jnp.float32)), 1e-6),
        }
        return {
            "params": params,
            "opt_state": opt_state,
            "env_states": env_states,
            "obs": obs,
            "key": key,
        }, metrics

    return init, train_iter


def train_ppo(
    reset_fn, step_fn, obs_dim, act_dim,
    total_timesteps=500_000, cfg=None, seed=0, log_every=10, verbose=True,
):
    """Host loop: run train iterations until the timestep budget is used."""
    cfg = cfg or PPOConfig()
    init, train_iter = make_ppo(reset_fn, step_fn, obs_dim, act_dim, cfg)
    state = init(jax.random.PRNGKey(seed))
    steps_per_iter = cfg.n_envs * cfg.n_steps
    n_iters = max(1, total_timesteps // steps_per_iter)
    history = []
    for it in range(n_iters):
        state, metrics = train_iter(state)
        if it % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            m["timesteps"] = (it + 1) * steps_per_iter
            history.append(m)
            if verbose:
                print(
                    f"iter {it}: reward {m['mean_reward']:.3f} "
                    f"ep_len {m['mean_episode_len']:.1f} "
                    f"({m['timesteps']} steps)"
                )
    return state["params"], history


def evaluate_policy(
    params, reset_fn, step_fn, key, n_episodes=20, max_steps=500,
    act_low=-1.0, act_high=1.0,
):
    """Deterministic closed-loop eval of a trained policy: mean actions,
    episodes latched at their first done (no auto-reset contamination).

    Returns dict: mean/std return, mean episode length.
    """
    keys = jax.random.split(key, n_episodes)
    env_states, obs = jax.vmap(reset_fn)(keys)

    @jax.jit
    def run(params, env_states, obs, keys):
        def body(carry, t):
            env_states, obs, done, rets, lens, ks = carry
            act = jnp.clip(policy_mean(params, obs), act_low, act_high)
            ks = jax.vmap(jax.random.fold_in)(ks, jnp.full(n_episodes, t))
            nxt, obs2, rew, d = jax.vmap(step_fn)(env_states, act, ks)
            alive = ~done
            rets = rets + rew * alive
            lens = lens + alive.astype(jnp.int32)
            done = done | d
            return (nxt, obs2, done, rets, lens, ks), None

        init = (
            env_states, obs, jnp.zeros(n_episodes, bool),
            jnp.zeros(n_episodes), jnp.zeros(n_episodes, jnp.int32), keys,
        )
        (_, _, _, rets, lens, _), _ = jax.lax.scan(
            body, init, jnp.arange(max_steps)
        )
        return rets, lens

    rets, lens = run(params, env_states, obs, keys)
    return {
        "mean_return": float(np.mean(np.asarray(rets))),
        "std_return": float(np.std(np.asarray(rets))),
        "mean_episode_len": float(np.mean(np.asarray(lens))),
    }
