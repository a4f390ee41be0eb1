"""Sequence-cartpole experiment: history-conditioned residual adaptation.

Re-designs the reference's ``train_seq_dyn`` path (train_cartpole.py:40-73 +
SequenceCartpoleDynamics, cartpole_dynamics.py:143-158): the dynamics model
is the analytic cartpole plus a small MLP residual over a buffer of the last
``buffer_length`` (state, action) pairs — recent history makes latent
mismatches (wind, friction changes) observable without vision.
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax

from apg_trajectory_tracking_tpu.dynamics.cartpole import (
    cartpole_params,
    cartpole_step,
)
from apg_trajectory_tracking_tpu.models.image_cartpole import (
    init_sequence_dynamics,
    sequence_dynamics_apply,
)
from apg_trajectory_tracking_tpu.training.common import (
    epoch_scan,
    shuffled_batches,
)

BUF = 3  # history length (rl_envs.py:21 buffer_len)


@partial(jax.jit, static_argnames=("n", "t"))
def collect_history_rollouts(key, dyn_params, n=64, t=20, dt=0.05):
    """Random-action rollouts with per-step (state, action) history.

    Returns (states (n*t, 4), histories (n*t, BUF*5), actions (n*t, 1),
    next_states (n*t, 4)); history rows are [s, a] newest first.
    """
    k1, k2 = jax.random.split(key)
    states0 = (jax.random.uniform(k1, (n, 4)) - 0.5) * 0.4
    actions = jax.random.uniform(k2, (n, t, 1), minval=-1.0, maxval=1.0)

    def body(carry, act):
        state, hist = carry
        nxt = cartpole_step(dyn_params, state, act, dt)
        sa = jnp.concatenate([state, act], axis=1)
        new_hist = jnp.roll(hist, 1, axis=1).at[:, 0].set(sa)
        return (nxt, new_hist), (state, new_hist, act, nxt)

    sa0 = jnp.concatenate([states0, jnp.zeros((n, 1))], axis=1)
    hist0 = jnp.repeat(sa0[:, None], BUF, axis=1)
    (_, _), (ss, hh, aa, nn) = jax.lax.scan(
        body, (states0, hist0), jnp.swapaxes(actions, 0, 1)
    )
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    return flat(ss), flat(hh).reshape(n * t, BUF * 5), flat(aa), flat(nn)


def fit_sequence_dynamics(
    key, mismatched_params, n_rollouts=64, t=20, dt=0.05, epochs=30,
    batch_size=64, lr=3e-3,
):
    """Fit the history-conditioned residual to a mismatched cartpole."""
    k_data, k_net, k_train = jax.random.split(key, 3)
    states, hists, actions, next_states = collect_history_rollouts(
        k_data, mismatched_params, n=n_rollouts, t=t, dt=dt
    )
    net = init_sequence_dynamics(k_net, buffer_length=BUF)
    analytic = cartpole_params()
    opt = optax.adam(lr)
    opt_state = opt.init(net)

    def loss_fn(net, s, h, a, s_next):
        pred = sequence_dynamics_apply(net, analytic, s, h, a, dt)
        return jnp.mean((pred - s_next) ** 2)

    def step_fn(net, opt_state, s, h, a, s_next):
        loss, g = jax.value_and_grad(loss_fn)(net, s, h, a, s_next)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(net, updates), opt_state, loss

    @jax.jit
    def epoch(net, opt_state, key):
        idx = shuffled_batches(key, states.shape[0], batch_size)
        return epoch_scan(
            step_fn, net, opt_state, idx, states, hists, actions,
            next_states,
        )

    history = []
    for _ in range(epochs):
        k_train, k = jax.random.split(k_train)
        net, opt_state, loss = epoch(net, opt_state, k)
        history.append(float(loss))
    return net, history


def sequence_dynamics_gap(net, mismatched_params, key, dt=0.05,
                          n_rollouts=16, t=16):
    """(sequence-model error, analytic error) one-step on
    ``n_rollouts * t`` held-out samples."""
    states, hists, actions, next_states = collect_history_rollouts(
        key, mismatched_params, n=n_rollouts, t=t, dt=dt
    )
    analytic = cartpole_params()
    pred = sequence_dynamics_apply(net, analytic, states, hists, actions, dt)
    base = cartpole_step(analytic, states, actions, dt)
    return (
        float(jnp.mean(jnp.abs(pred - next_states))),
        float(jnp.mean(jnp.abs(base - next_states))),
    )
