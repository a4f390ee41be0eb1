"""Cartpole controller network.

JAX re-implementation of ``neural_control/models/simple_model.py:9-28``:
MLP 4 -> 32 -> 64 -> 64 -> 32 -> out with tanh everywhere *including the
output* (actions live in [-1, 1]; no sigmoid for cartpole), and the
reference's deliberate zeroing of the cart x-position input
(``x[:, 0] *= 0``, line 21 — the controller is translation-invariant).
"""

import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.models.common import linear_init

_LAYERS = [("fc0", 32), ("fc1", 64), ("fc2", 64), ("fc3", 32)]


def init_cartpole_net(key, in_size=4, out_size=10):
    keys = jax.random.split(key, len(_LAYERS) + 1)
    params = {}
    prev = in_size
    for k, (name, width) in zip(keys[:-1], _LAYERS):
        params[name] = linear_init(k, prev, width)
        prev = width
    params["fc_out"] = linear_init(keys[-1], prev, out_size)
    return params


def cartpole_net_apply(params, state):
    """Forward pass: (B, 4) state -> (B, out) actions in [-1, 1]."""
    x = state * jnp.array([0.0, 1.0, 1.0, 1.0], dtype=state.dtype)
    for name, _ in _LAYERS:
        w, b = params[name]
        x = jnp.tanh(x @ w + b)
    w, b = params["fc_out"]
    return jnp.tanh(x @ w + b)
