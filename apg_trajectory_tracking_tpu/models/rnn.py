"""Recurrent (LSTM-cell) controller for the quad LSTM training mode.

JAX re-implementation of ``neural_control/models/rnn.py:8-51``:
  * same Conv1d reference head as the feed-forward net;
  * LSTMCell((state_dim + 20*(horizon-2)) -> hidden 8);
  * Linear(8 -> action_dim) output.

The hidden state is an explicit ``(h, c)`` pytree threaded through the scan
(the reference mutates ``self.hidden_state``; here recurrence is functional).
The reference initializes hidden state with ``randn`` (rnn.py:30-33) — we
keep that behavior behind ``init_lstm_state(random=...)`` with a
zero-init default exposed too.
"""

import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.models.common import (
    conv1d_apply,
    conv1d_init,
    linear_init,
)

HIDDEN = 8


def init_lstm_net(key, state_dim, horizon, ref_dim, action_dim, conv=True,
                  hidden=HIDDEN):
    """``hidden=8`` matches the reference's LSTM_NEW exactly; wider cells
    are used by the recurrent-distillation experiments (apply/init_state
    derive shapes from the params, so any width round-trips)."""
    keys = jax.random.split(key, 5)
    reshape_len = 20 * (horizon - 2) if conv else 64
    in_dim = state_dim + reshape_len
    # torch LSTMCell init: U(-1/sqrt(hidden), 1/sqrt(hidden)) for all 4 mats
    bound = 1.0 / jnp.sqrt(hidden)
    u = lambda k, shape: jax.random.uniform(
        k, shape, minval=-bound, maxval=bound, dtype=jnp.float32
    )
    kih, khh, kbih, kbhh = jax.random.split(keys[0], 4)
    params = {
        "w_ih": u(kih, (in_dim, 4 * hidden)),
        "w_hh": u(khh, (hidden, 4 * hidden)),
        "b_ih": u(kbih, (4 * hidden,)),
        "b_hh": u(kbhh, (4 * hidden,)),
        "fc_out": linear_init(keys[1], hidden, action_dim),
    }
    if conv:
        params["conv_ref"] = conv1d_init(keys[2], ref_dim, 20, 3)
    else:
        params["ref_in"] = linear_init(keys[2], horizon * ref_dim, 64)
    return params


def init_lstm_state(batch_size, key=None, hidden=HIDDEN):
    """(h, c) initial state; random-normal when a key is given (the
    reference's randn quirk, rnn.py:32-33), zeros otherwise."""
    if key is None:
        z = jnp.zeros((batch_size, hidden), dtype=jnp.float32)
        return z, z
    kh, kc = jax.random.split(key)
    return (
        jax.random.normal(kh, (batch_size, hidden), dtype=jnp.float32),
        jax.random.normal(kc, (batch_size, hidden), dtype=jnp.float32),
    )


def lstm_net_apply(params, carry, state, ref):
    """One recurrent step.

    Args:
        params: dict from :func:`init_lstm_net`.
        carry: (h, c) each (B, 8).
        state: (B, state_dim).
        ref: (B, horizon, ref_dim).
    Returns:
        (new_carry, logits (B, action_dim)).
    """
    if "conv_ref" in params:
        x = jnp.swapaxes(ref, -1, -2)
        w, b = params["conv_ref"]
        x = jax.nn.relu(conv1d_apply(w, b, x))
        r = x.reshape(x.shape[0], -1)
    else:
        w, b = params["ref_in"]
        r = jnp.tanh(ref.reshape(ref.shape[0], -1) @ w + b)
    inp = jnp.concatenate([state, r], axis=-1)

    h, c = carry
    gates = (
        inp @ params["w_ih"] + params["b_ih"]
        + h @ params["w_hh"] + params["b_hh"]
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    new_c = f * c + i * g
    new_h = o * jnp.tanh(new_c)

    w, b = params["fc_out"]
    return (new_h, new_c), new_h @ w + b
