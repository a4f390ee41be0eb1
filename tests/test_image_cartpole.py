"""Image/sequence cartpole experiment component tests."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.dynamics.cartpole import (
    cartpole_params,
    cartpole_step,
)
from apg_trajectory_tracking_tpu.models.image_cartpole import (
    render_cartpole_image,
    render_image_stack,
    init_state_to_img,
    state_to_img_apply,
    init_image_controller,
    image_controller_apply,
    init_image_dynamics,
    image_dynamics_apply,
    init_sequence_dynamics,
    sequence_dynamics_apply,
)


def test_render_image_responds_to_theta():
    s_up = jnp.array([0.0, 0.0, 0.0, 0.0])
    s_tilt = jnp.array([0.0, 0.0, 0.8, 0.0])
    img_up = np.asarray(render_cartpole_image(s_up))
    img_tilt = np.asarray(render_cartpole_image(s_tilt))
    assert img_up.shape == (100, 120)
    assert np.abs(img_up - img_tilt).sum() > 10  # visibly different
    assert 0 <= img_up.min() and img_up.max() <= 1


@pytest.mark.slow
def test_state_to_img_trains_toward_renderer():
    """The generator can fit the procedural renderer (a few Adam steps
    reduce the reconstruction loss)."""
    import optax

    key = jax.random.PRNGKey(0)
    params = init_state_to_img(key, width=120, height=100)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(
        rng.uniform(-0.3, 0.3, size=(32, 2)).astype(np.float32)
    )
    states = jnp.zeros((32, 4)).at[:, 0].set(inputs[:, 0]).at[:, 2].set(
        inputs[:, 1]
    )
    targets = render_image_stack(states)

    def loss_fn(p):
        pred = state_to_img_apply(p, inputs)
        return jnp.mean((pred - targets) ** 2)

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, o = opt.update(g, o)
        return optax.apply_updates(p, updates), o, loss

    l0 = None
    for i in range(60):
        params, opt_state, loss = step(params, opt_state)
        if i == 0:
            l0 = float(loss)
    assert float(loss) < 0.7 * l0


def test_image_controller_shapes():
    key = jax.random.PRNGKey(1)
    params = init_image_controller(key, 100, 120, out_size=1, nr_img=3)
    imgs = jnp.zeros((2, 3, 100, 120))
    out = image_controller_apply(params, imgs)
    assert out.shape == (2, 1)
    assert np.all(np.abs(np.asarray(out)) <= 1)


def test_image_dynamics_near_analytic_at_init():
    key = jax.random.PRNGKey(2)
    params = init_image_dynamics(key, 40, 30, nr_img=3)
    dyn = cartpole_params()
    state = jnp.asarray(np.random.RandomState(0).randn(2, 4).astype(np.float32))
    imgs = jnp.zeros((2, 3, 30, 40))
    action = jnp.full((2, 1), 0.3)
    got = image_dynamics_apply(params, dyn, state, imgs, action, 0.05)
    expected = cartpole_step(dyn, state, action, 0.05)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=0.05)


def test_sequence_dynamics_near_analytic_at_init():
    key = jax.random.PRNGKey(3)
    params = init_sequence_dynamics(key, buffer_length=3)
    dyn = cartpole_params()
    state = jnp.asarray(np.random.RandomState(1).randn(4, 4).astype(np.float32))
    history = jnp.asarray(
        np.random.RandomState(2).randn(4, 15).astype(np.float32)
    )
    action = jnp.full((4, 1), -0.2)
    got = sequence_dynamics_apply(params, dyn, state, history, action, 0.05)
    expected = cartpole_step(dyn, state, action, 0.05)
    # output layer is near-zero (std 1e-4); hidden activations are O(1),
    # so the initial delta is bounded by ~std * hidden_width
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=5e-3
    )


def test_image_dqn_shapes_and_grad():
    import jax, jax.numpy as jnp, numpy as np
    from apg_trajectory_tracking_tpu.models.image_cartpole import (
        init_image_dqn,
        image_dqn_apply,
    )

    p = init_image_dqn(jax.random.PRNGKey(0), 100, 120, out_size=1, nr_img=3)
    imgs = jnp.asarray(np.random.RandomState(0).rand(4, 3, 100, 120),
                       jnp.float32)
    out = image_dqn_apply(p, imgs)
    assert out.shape == (4, 1)
    g = jax.grad(lambda pp: jnp.sum(image_dqn_apply(pp, imgs) ** 2))(p)
    assert all(np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_image_dynamics_adaptation_end_to_end():
    """The vision-conditioned residual fits a pole-length mismatch better
    than the analytic model (the reference's train_image_dyn experiment,
    train_cartpole.py:40-73)."""
    import jax
    from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_params
    from apg_trajectory_tracking_tpu.training.train_image_cartpole import (
        fit_image_dynamics,
        image_dynamics_gap,
    )

    mismatched = cartpole_params({"length": 0.8})  # pole 1.6x longer
    net, history, _ = fit_image_dynamics(
        jax.random.PRNGKey(0), mismatched, n_rollouts=16, t=12, epochs=12,
    )
    assert history[-1] < history[0] * 0.6, history
    img_err, analytic_err = image_dynamics_gap(
        net, mismatched, jax.random.PRNGKey(99)
    )
    assert img_err < 0.8 * analytic_err, (img_err, analytic_err)


@pytest.mark.slow
def test_sequence_dynamics_adaptation_end_to_end():
    """The history-conditioned residual fits a wind mismatch far better
    than the analytic model (train_seq_dyn, train_cartpole.py:40-73)."""
    import jax
    from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_params
    from apg_trajectory_tracking_tpu.training.train_sequence_cartpole import (
        fit_sequence_dynamics,
        sequence_dynamics_gap,
    )

    mismatched = cartpole_params({"wind": 0.5})
    net, history = fit_sequence_dynamics(
        jax.random.PRNGKey(0), mismatched, n_rollouts=64, t=16, epochs=60,
    )
    assert history[-1] < history[0] * 0.1, history
    seq_err, analytic_err = sequence_dynamics_gap(
        net, mismatched, jax.random.PRNGKey(99)
    )
    # the history-conditioned model explains the wind almost entirely
    assert seq_err < 0.2 * analytic_err, (seq_err, analytic_err)
