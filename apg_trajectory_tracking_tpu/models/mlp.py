"""Controller network for quad and fixed-wing (state + reference -> actions).

JAX re-implementation of ``neural_control/models/hutter_model.py:6-49``:
  * state branch: Linear(state_dim -> 64) + tanh
  * reference branch: either Conv1d(ref_dim -> 20, k=3) + relu over the
    horizon axis (quad, conv=True) or Linear(horizon*ref_dim -> 64) + tanh
    (wing, conv=False)
  * trunk: 3 x (Linear(64) + tanh), then Linear -> horizon * action_dim.

Sigmoid is applied by the caller (training loop / controller wrapper), as in
the reference (train_base.py:203, network_wrapper.py:57).
"""

import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.models.common import (
    conv1d_apply,
    conv1d_init,
    linear_init,
)


def init_control_net(key, state_dim, horizon, ref_dim, out_dim, conv=True,
                     hidden=64):
    """Initialize params. ``out_dim`` = horizon*action_dim (concurrent) or
    action_dim (autoregressive). ``hidden=64`` matches the reference's
    hutter_model exactly; wider students are used by the MPC distillation
    capacity experiments (the apply fn reads shapes from the params, so
    any width round-trips through checkpoints that record it)."""
    keys = jax.random.split(key, 7)
    reshape_len = 20 * (horizon - 2) if conv else hidden
    params = {
        "states_in": linear_init(keys[0], state_dim, hidden),
        "fc1": linear_init(keys[2], hidden + reshape_len, hidden),
        "fc2": linear_init(keys[3], hidden, hidden),
        "fc3": linear_init(keys[4], hidden, hidden),
        "fc_out": linear_init(keys[5], hidden, out_dim),
    }
    if conv:
        params["conv_ref"] = conv1d_init(keys[1], ref_dim, 20, 3)
    else:
        params["ref_in"] = linear_init(keys[1], horizon * ref_dim, hidden)
    return params


def _ref_branch(params, ref):
    if "conv_ref" in params:
        # (B, horizon, ref_dim) -> torch NCL (B, ref_dim, horizon)
        x = jnp.swapaxes(ref, -1, -2)
        w, b = params["conv_ref"]
        x = jax.nn.relu(conv1d_apply(w, b, x))
        return x.reshape(x.shape[0], -1)
    w, b = params["ref_in"]
    flat = ref.reshape(ref.shape[0], -1)
    return jnp.tanh(flat @ w + b)


def control_net_apply(params, state, ref):
    """Forward pass.

    Args:
        params: dict from :func:`init_control_net`.
        state: (B, state_dim) preprocessed state features.
        ref: (B, horizon, ref_dim) reference window (conv) or (B, ref_dim)
             relative target (dense); dense inputs may also be (B, 1, ref_dim).
    Returns:
        (B, out_dim) raw logits (caller applies sigmoid).
    """
    if ref.ndim == 2:
        ref = ref[:, None, :]
    w, b = params["states_in"]
    s = jnp.tanh(state @ w + b)
    r = _ref_branch(params, ref)
    x = jnp.concatenate([s, r], axis=-1)
    for name in ("fc1", "fc2", "fc3"):
        w, b = params[name]
        x = jnp.tanh(x @ w + b)
    w, b = params["fc_out"]
    return x @ w + b
