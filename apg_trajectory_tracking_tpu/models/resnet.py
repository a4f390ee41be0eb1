"""Residual MLP controller.

Re-designs ``neural_control/models/resnet_like_model.py:5-43``: a 4-block
residual MLP, 100 wide, relu activations, with a 40-wide neck before the
output layer. The reference defines it but never wires it into a training
script; it is kept here with the same status — an alternative controller
body interchangeable with :mod:`.simple` (same (B, in) -> (B, out) calling
convention).
"""

import jax

from apg_trajectory_tracking_tpu.models.common import linear_init

_WIDTH = 100
_BLOCKS = 4


def init_resnet_net(key, in_size, out_size):
    keys = jax.random.split(key, 2 * _BLOCKS + 3)
    params = {"fc_in": linear_init(keys[0], in_size, _WIDTH)}
    for i in range(2 * _BLOCKS):
        params[f"fc{i + 1}"] = linear_init(keys[i + 1], _WIDTH, _WIDTH)
    params["fc_last"] = linear_init(keys[2 * _BLOCKS + 1], _WIDTH, 40)
    params["fc_out"] = linear_init(keys[2 * _BLOCKS + 2], 40, out_size)
    return params


def resnet_net_apply(params, x):
    """(B, in) -> (B, out) raw outputs (resnet_like_model.py:22-43)."""
    w, b = params["fc_in"]
    x = jax.nn.relu(x @ w + b)
    for blk in range(_BLOCKS):
        shortcut = x
        w, b = params[f"fc{2 * blk + 1}"]
        x = jax.nn.relu(x @ w + b)
        w, b = params[f"fc{2 * blk + 2}"]
        x = jax.nn.relu(x @ w + b) + shortcut
    w, b = params["fc_last"]
    x = jax.nn.relu(x @ w + b)
    w, b = params["fc_out"]
    return x @ w + b
