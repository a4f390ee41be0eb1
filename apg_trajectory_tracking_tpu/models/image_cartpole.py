"""Image-based cartpole experiment components.

Re-designs the reference's image-cartpole family:
  * a procedural binary renderer replacing the pyglet-screenshot +
    cv2-threshold pipeline (cartpole_env.py:239-245, rl_envs.py:64-78) —
    states render directly to (H, W) binary images on device;
  * ``StateToImg``: state -> image generator (simple_model.py:31-48);
  * ``ImageControllerNet``: conv controller over an image-history stack
    (simple_model.py:51-82);
  * ``ImageCartpoleDynamics``: analytic step + conv residual over the image
    stack (cartpole_dynamics.py:161-231);
  * ``SequenceCartpoleDynamics``: residual over a state-action history
    buffer (cartpole_dynamics.py:143-158 + learnt_dynamics.py:5-55).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_step
from apg_trajectory_tracking_tpu.models.common import linear_init

IMG_H, IMG_W = 100, 120


def render_cartpole_image(state, height=IMG_H, width=IMG_W,
                          x_threshold=2.4, pole_len_px=40.0,
                          x_offset_px=0.0):
    """Binary image of the cartpole, centered at the cart's x position
    (the reference's center_at_x crop, evaluate_cartpole.py:63-77).

    ``x_offset_px`` shifts the cart horizontally — used to encode relative
    displacement across a frame stack (the reference rolls every buffered
    frame by the *current* cart position, rl_envs.py:65-77, so older frames
    show where the cart was relative to now; velocity is visible in frame
    differences).

    Differentiable-ish soft raster (sigmoid edges) so it can also serve as a
    training target for StateToImg. Returns (height, width) in [0, 1].
    """
    theta = state[..., 2]
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    cx, cy = width / 2.0 + x_offset_px, height * 0.75  # cart pivot point
    sharp = 2.0

    # cart: rectangle around the pivot
    cart = jax.nn.sigmoid(sharp * (12.0 - jnp.abs(xs - cx))) * jax.nn.sigmoid(
        sharp * (5.0 - jnp.abs(ys - cy - 6.0))
    )

    # pole: distance of each pixel to the pole segment
    dx = jnp.sin(theta)[..., None, None]
    dy = -jnp.cos(theta)[..., None, None]
    px = xs - cx
    py = ys - cy
    t = jnp.clip(px * dx + py * dy, 0.0, pole_len_px)
    dist = jnp.sqrt((px - t * dx) ** 2 + (py - t * dy) ** 2 + 1e-6)
    pole = jax.nn.sigmoid(sharp * (2.0 - dist))
    return jnp.clip(cart + pole, 0.0, 1.0)


def render_image_stack(states, **kwargs):
    """(T, 4) state history -> (T, H, W) image stack."""
    return jax.vmap(lambda s: render_cartpole_image(s, **kwargs))(states)


# ---------------------------------------------------------------------------
# StateToImg (simple_model.py:31-48)
# ---------------------------------------------------------------------------


def init_state_to_img(key, width=IMG_W, height=IMG_H):
    keys = jax.random.split(key, 4)
    return {
        "fc1": linear_init(keys[0], 2, 32),
        "fc2": linear_init(keys[1], 32, 128),
        "fc3": linear_init(keys[2], 128, 256),
        "fc_out": linear_init(keys[3], 256, width * height),
    }


def state_to_img_apply(params, x, width=IMG_W, height=IMG_H):
    """(B, 2) [x_pos, theta] -> (B, H, W) in [0, 1]."""
    for name in ("fc1", "fc2", "fc3"):
        wgt, b = params[name]
        x = jnp.tanh(x @ wgt + b)
    wgt, b = params["fc_out"]
    x = jax.nn.sigmoid(x @ wgt + b)
    return x.reshape(-1, height, width)


# ---------------------------------------------------------------------------
# conv helpers (NCHW, torch semantics)
# ---------------------------------------------------------------------------


def _conv2d_init(key, c_in, c_out, k):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(c_in * k * k)
    w = jax.random.uniform(kw, (c_out, c_in, k, k), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (c_out,), minval=-bound, maxval=bound)
    return w, b


def _conv2d(w, b, x, padding="VALID"):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), padding, dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    return out + b[None, :, None, None]


def _stack_with_diffs(images):
    """Channel stack [imgs, img diffs] (simple_model.py:67-72)."""
    diffs = images[:, 1:] - images[:, :-1]
    return jnp.concatenate([images, diffs], axis=1)


# ---------------------------------------------------------------------------
# ImageControllerNet (simple_model.py:51-82)
# ---------------------------------------------------------------------------


def init_image_controller(key, img_h, img_w, out_size=1, nr_img=5):
    keys = jax.random.split(key, 6)
    flat = 2 * (img_h - 6) * (img_w - 6)
    return {
        "conv1": _conv2d_init(keys[0], nr_img * 2 - 1, 10, 5),
        "conv2": _conv2d_init(keys[1], 10, 2, 3),
        "fc1": linear_init(keys[2], flat, 64),
        "fc2": linear_init(keys[3], 64, 64),
        "fc3": linear_init(keys[4], 64, 32),
        "fc_out": linear_init(keys[5], 32, out_size),
    }


def image_controller_apply(params, images):
    """(B, nr_img, H, W) image history -> (B, out) actions in [-1, 1]."""
    x = _stack_with_diffs(images)
    x = jax.nn.relu(_conv2d(*params["conv1"], x))
    x = jax.nn.relu(_conv2d(*params["conv2"], x))
    x = x.reshape(x.shape[0], -1)
    for name in ("fc1", "fc2", "fc3"):
        w, b = params[name]
        x = jnp.tanh(x @ w + b)
    w, b = params["fc_out"]
    return jnp.tanh(x @ w + b)


# ---------------------------------------------------------------------------
# ImageCartpoleDynamics (cartpole_dynamics.py:161-231)
# ---------------------------------------------------------------------------


def init_image_dynamics(key, img_w, img_h, nr_img=5, state_size=4,
                        action_dim=1):
    keys = jax.random.split(key, 5)
    flat = 10 * img_w * img_h
    return {
        "conv1": _conv2d_init(keys[0], nr_img * 2 - 1, 10, 5),
        "conv2": _conv2d_init(keys[1], 10, 10, 3),
        "linear_act": linear_init(keys[2], action_dim, 32),
        "linear_state_1": linear_init(keys[3], flat + 32, 64),
        # no-bias output layer, zero-ish effect at init like the residuals
        "linear_state_2": (
            1e-4 * jax.random.normal(keys[4], (64, state_size)),
        ),
    }


def image_dynamics_apply(params, dyn_params, state, images, action, dt):
    """f_hat(s, image stack, a) = analytic step + conv residual
    (cartpole_dynamics.py:220-231)."""
    new_state = cartpole_step(dyn_params, state, action, dt)
    x = _stack_with_diffs(images)
    x = jax.nn.relu(_conv2d(*params["conv1"], x, padding="SAME"))
    x = jax.nn.relu(_conv2d(*params["conv2"], x, padding="SAME"))
    flat = x.reshape(x.shape[0], -1)
    w, b = params["linear_act"]
    act_enc = jax.nn.relu(action @ w + b)
    sa = jnp.concatenate([flat, act_enc], axis=1)
    w, b = params["linear_state_1"]
    h = jax.nn.relu(sa @ w + b)
    (w2,) = params["linear_state_2"]
    return new_state + h @ w2


# ---------------------------------------------------------------------------
# SequenceCartpoleDynamics (cartpole_dynamics.py:143-158)
# ---------------------------------------------------------------------------


class SequenceResidual(NamedTuple):
    w1: jnp.ndarray
    b1: jnp.ndarray
    w2: jnp.ndarray


def init_sequence_dynamics(key, buffer_length=3, std=1e-4):
    """Residual over a (state+action) history of ``buffer_length`` steps
    (SequenceCartpoleDynamics, cartpole_dynamics.py:143-158).

    Deliberate deviation: the reference inherits LearntDynamicsMPC's
    3-layer tanh NO-BIAS stack with every layer drawn at std=1e-4
    (learnt_dynamics.py:28-45). Besides the vanishing-gradient saddle
    (see dynamics/learnt.py), the bias-free tanh stack cannot express the
    near-constant offsets that parameter mismatches (e.g. wind) produce
    across diverse inputs. We use the same relu+bias residual family as
    the state-residual (ResidualParams): hidden layer fan-in init + bias,
    output layer near-zero — starts-at-analytic preserved."""
    in_dim = 5 * buffer_length + 1  # history (4+1 per step) + action
    k1, k2, k3 = jax.random.split(key, 3)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    return SequenceResidual(
        w1=jax.random.uniform(k1, (in_dim, 64), minval=-bound, maxval=bound),
        b1=jax.random.uniform(k2, (64,), minval=-bound, maxval=bound),
        w2=std * jax.random.normal(k3, (64, 4)),
    )


def sequence_dynamics_apply(params, dyn_params, state, history, action, dt):
    """f_hat(s, history, a) (cartpole_dynamics.py:150-158)."""
    new_state = cartpole_step(dyn_params, state, action, dt)
    sa = jnp.concatenate([history, action], axis=-1)
    h = jax.nn.relu(sa @ params.w1 + params.b1)
    return new_state + h @ params.w2


# ---------------------------------------------------------------------------
# ImageControllerNetDQN (simple_model.py:92-132)
# ---------------------------------------------------------------------------


def _batchnorm(x, scale, bias, eps=1e-5):
    """Batch-statistics normalization over (N, H, W) per channel — the
    training-mode semantics of the reference's nn.BatchNorm2d (the DQN net
    is only ever used in training mode in the reference)."""
    mean = x.mean(axis=(0, 2, 3), keepdims=True)
    var = x.var(axis=(0, 2, 3), keepdims=True)
    xn = (x - mean) / jnp.sqrt(var + eps)
    return xn * scale[None, :, None, None] + bias[None, :, None, None]


def _conv_out(size, k=5, s=2):
    return (size - (k - 1) - 1) // s + 1


def init_image_dqn(key, img_h, img_w, out_size=1, nr_img=3):
    """3x (conv k5 s2 + BN + relu) -> linear head (simple_model.py:92-124).
    Channel widths 16/32/32."""
    keys = jax.random.split(key, 4)
    convw = _conv_out(_conv_out(_conv_out(img_w)))
    convh = _conv_out(_conv_out(_conv_out(img_h)))
    return {
        "conv1": _conv2d_init(keys[0], nr_img, 16, 5),
        "bn1": (jnp.ones(16), jnp.zeros(16)),
        "conv2": _conv2d_init(keys[1], 16, 32, 5),
        "bn2": (jnp.ones(32), jnp.zeros(32)),
        "conv3": _conv2d_init(keys[2], 32, 32, 5),
        "bn3": (jnp.ones(32), jnp.zeros(32)),
        "head": linear_init(keys[3], convw * convh * 32, out_size),
    }


def _conv2d_strided(w, b, x, stride=2):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def image_dqn_apply(params, images):
    """(B, nr_img, H, W) -> (B, out) (simple_model.py:128-132)."""
    x = images
    for i in (1, 2, 3):
        x = _conv2d_strided(*params[f"conv{i}"], x)
        x = jax.nn.relu(_batchnorm(x, *params[f"bn{i}"]))
    x = x.reshape(x.shape[0], -1)
    w, b = params["head"]
    return x @ w + b
