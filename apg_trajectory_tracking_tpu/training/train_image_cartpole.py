"""Image-cartpole experiment: adaptation with a vision-conditioned residual.

Re-designs the reference's ``train_image_dyn`` path (train_cartpole.py:40-73,
167-205 + ImageCartpoleDynamics, cartpole_dynamics.py:161-231): the dynamics
model is the analytic cartpole plus a conv residual over a rendered
image-history stack — the mismatch between the analytic model and the true
(modified) environment is *visible* in the images (e.g. a different pole
length), so one dynamics model can adapt across mismatches at test time.

The pipeline is functional and fully jitted:

  1. roll out the MISMATCHED env under random actions, rendering an
     ``nr_img``-frame stack per step on device (the reference screenshots
     pyglet + cv2-thresholds, rl_envs.py:64-78);
  2. fit the image-conditioned residual on one-step transitions;
  3. (optionally) train the state controller against the fitted model and
     evaluate in the mismatched env.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from apg_trajectory_tracking_tpu.dynamics.cartpole import (
    cartpole_params,
    cartpole_step,
)
from apg_trajectory_tracking_tpu.models.image_cartpole import (
    init_image_dynamics,
    image_dynamics_apply,
    render_cartpole_image,
)
from apg_trajectory_tracking_tpu.training.common import (
    epoch_scan,
    shuffled_batches,
)

NR_IMG = 5
IMG_H, IMG_W = 50, 60  # half-res renders keep the conv residual cheap


def _render(state):
    return render_cartpole_image(state, height=IMG_H, width=IMG_W,
                                 pole_len_px=20.0)


@partial(jax.jit, static_argnames=("n", "t"))
def collect_image_rollouts(key, dyn_params, n=64, t=20, dt=0.05):
    """Random-action rollouts with per-step image stacks.

    Returns (states (n*t, 4), stacks (n*t, NR_IMG, H, W),
    actions (n*t, 1), next_states (n*t, 4)): frame i of a stack is the
    render of the state i steps ago (newest first).
    """
    k1, k2 = jax.random.split(key)
    states0 = (jax.random.uniform(k1, (n, 4)) - 0.5) * jnp.asarray(
        [0.4, 0.4, 0.4, 0.4]
    )
    actions = jax.random.uniform(k2, (n, t, 1), minval=-1.0, maxval=1.0)

    def body(carry, act):
        state, stack = carry
        nxt = cartpole_step(dyn_params, state, act, dt)
        new_stack = jnp.roll(stack, 1, axis=1).at[:, 0].set(
            jax.vmap(_render)(state)
        )
        return (nxt, new_stack), (state, new_stack, act, nxt)

    stack0 = jnp.repeat(
        jax.vmap(_render)(states0)[:, None], NR_IMG, axis=1
    )
    (_, _), (ss, stacks, aa, nn) = jax.lax.scan(
        body, (states0, stack0), jnp.swapaxes(actions, 0, 1)
    )
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    return flat(ss), flat(stacks), flat(aa), flat(nn)


def fit_image_dynamics(
    key, mismatched_params, n_rollouts=64, t=20, dt=0.05, epochs=20,
    batch_size=64, lr=3e-3,
):
    """Fit the image-conditioned residual to a mismatched cartpole.

    Returns (params dict, history of per-epoch losses, data tuple).
    """
    k_data, k_net, k_train = jax.random.split(key, 3)
    data = collect_image_rollouts(
        k_data, mismatched_params, n=n_rollouts, t=t, dt=dt
    )
    states, stacks, actions, next_states = data

    net = init_image_dynamics(
        k_net, IMG_W, IMG_H, nr_img=NR_IMG, state_size=4, action_dim=1
    )
    analytic = cartpole_params()
    opt = optax.adam(lr)
    opt_state = opt.init(net)

    def loss_fn(net, s, imgs, a, s_next):
        pred = image_dynamics_apply(net, analytic, s, imgs, a, dt)
        return jnp.mean((pred - s_next) ** 2)

    def step_fn(net, opt_state, s, imgs, a, s_next):
        loss, g = jax.value_and_grad(loss_fn)(net, s, imgs, a, s_next)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(net, updates), opt_state, loss

    @jax.jit
    def epoch(net, opt_state, key):
        idx = shuffled_batches(key, states.shape[0], batch_size)
        return epoch_scan(
            step_fn, net, opt_state, idx, states, stacks, actions,
            next_states,
        )

    history = []
    for _ in range(epochs):
        k_train, k = jax.random.split(k_train)
        net, opt_state, loss = epoch(net, opt_state, k)
        history.append(float(loss))
    return net, history, data


def image_dynamics_gap(net, mismatched_params, key, dt=0.05, n_rollouts=16,
                       t=16):
    """(image-model error, analytic error) one-step vs the mismatched env
    on ``n_rollouts * t`` held-out samples."""
    states, stacks, actions, next_states = collect_image_rollouts(
        key, mismatched_params, n=n_rollouts, t=t, dt=dt
    )
    analytic = cartpole_params()
    pred = image_dynamics_apply(net, analytic, states, stacks, actions, dt)
    base = cartpole_step(analytic, states, actions, dt)
    return (
        float(jnp.mean(jnp.abs(pred - next_states))),
        float(jnp.mean(jnp.abs(base - next_states))),
    )
