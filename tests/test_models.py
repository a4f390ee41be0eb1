"""Parity tests: JAX models vs the reference torch models with copied weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from apg_trajectory_tracking_tpu.models import (
    init_control_net,
    control_net_apply,
    init_cartpole_net,
    cartpole_net_apply,
    init_lstm_net,
    lstm_net_apply,
)
from apg_trajectory_tracking_tpu.losses import (
    quad_mpc_loss,
    cartpole_loss_mpc,
    fixed_wing_mpc_loss,
)

from tests.reference_oracle import load_reference_dynamics  # installs path

RNG = np.random.RandomState(3)


def _torch_hutter_net(state_dim, horizon, ref_dim, out_dim, conv):
    load_reference_dynamics()  # ensures /root/reference on sys.path or skips
    from neural_control.models.hutter_model import Net

    return Net(state_dim, horizon, ref_dim, out_dim, conv=conv)


def test_control_net_matches_torch_conv():
    torch = __import__("pytest").importorskip("torch")

    net = _torch_hutter_net(15, 10, 9, 40, conv=1)
    params = init_control_net(jax.random.PRNGKey(0), 15, 10, 9, 40, conv=True)
    # copy torch weights into our pytree
    params["states_in"] = (
        jnp.asarray(net.states_in.weight.detach().numpy().T),
        jnp.asarray(net.states_in.bias.detach().numpy()),
    )
    params["conv_ref"] = (
        jnp.asarray(net.conv_ref.weight.detach().numpy()),
        jnp.asarray(net.conv_ref.bias.detach().numpy()),
    )
    for name in ("fc1", "fc2", "fc3", "fc_out"):
        layer = getattr(net, name)
        params[name] = (
            jnp.asarray(layer.weight.detach().numpy().T),
            jnp.asarray(layer.bias.detach().numpy()),
        )
    state = RNG.randn(6, 15).astype(np.float32)
    ref = RNG.randn(6, 10, 9).astype(np.float32)
    expected = net(torch.from_numpy(state), torch.from_numpy(ref)).detach().numpy()
    got = np.asarray(control_net_apply(params, state, ref))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_control_net_matches_torch_dense():
    torch = __import__("pytest").importorskip("torch")

    net = _torch_hutter_net(9, 1, 3, 40, conv=False)
    params = init_control_net(jax.random.PRNGKey(0), 9, 1, 3, 40, conv=False)
    params["states_in"] = (
        jnp.asarray(net.states_in.weight.detach().numpy().T),
        jnp.asarray(net.states_in.bias.detach().numpy()),
    )
    params["ref_in"] = (
        jnp.asarray(net.ref_in.weight.detach().numpy().T),
        jnp.asarray(net.ref_in.bias.detach().numpy()),
    )
    for name in ("fc1", "fc2", "fc3", "fc_out"):
        layer = getattr(net, name)
        params[name] = (
            jnp.asarray(layer.weight.detach().numpy().T),
            jnp.asarray(layer.bias.detach().numpy()),
        )
    state = RNG.randn(4, 9).astype(np.float32)
    ref = RNG.randn(4, 3).astype(np.float32)
    expected = net(torch.from_numpy(state), torch.from_numpy(ref)).detach().numpy()
    got = np.asarray(control_net_apply(params, state, ref))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_cartpole_net_matches_torch():
    torch = __import__("pytest").importorskip("torch")

    load_reference_dynamics()
    from neural_control.models.simple_model import Net

    net = Net(4, 10)
    params = init_cartpole_net(jax.random.PRNGKey(0), 4, 10)
    for name in ("fc0", "fc1", "fc2", "fc3", "fc_out"):
        layer = getattr(net, name)
        params[name] = (
            jnp.asarray(layer.weight.detach().numpy().T),
            jnp.asarray(layer.bias.detach().numpy()),
        )
    state = RNG.randn(5, 4).astype(np.float32)
    # torch net mutates input in place (x[:, 0] *= 0) — pass a copy
    expected = net(torch.from_numpy(state.copy())).detach().numpy()
    got = np.asarray(cartpole_net_apply(params, state))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_lstm_matches_torch():
    torch = __import__("pytest").importorskip("torch")

    load_reference_dynamics()
    from neural_control.models.rnn import LSTM_NEW

    net = LSTM_NEW(15, 10, 9, 4, conv=True)
    params = init_lstm_net(jax.random.PRNGKey(0), 15, 10, 9, 4, conv=True)
    params["conv_ref"] = (
        jnp.asarray(net.conv_ref.weight.detach().numpy()),
        jnp.asarray(net.conv_ref.bias.detach().numpy()),
    )
    params["w_ih"] = jnp.asarray(net.lstm.weight_ih.detach().numpy().T)
    params["w_hh"] = jnp.asarray(net.lstm.weight_hh.detach().numpy().T)
    params["b_ih"] = jnp.asarray(net.lstm.bias_ih.detach().numpy())
    params["b_hh"] = jnp.asarray(net.lstm.bias_hh.detach().numpy())
    params["fc_out"] = (
        jnp.asarray(net.fc_out.weight.detach().numpy().T),
        jnp.asarray(net.fc_out.bias.detach().numpy()),
    )

    B = 3
    net.reset_hidden_state(B)
    h0 = net.hidden_state.detach().numpy()
    c0 = net.cell_state.detach().numpy()
    carry = (jnp.asarray(h0), jnp.asarray(c0))

    state = RNG.randn(B, 15).astype(np.float32)
    ref = RNG.randn(B, 10, 9).astype(np.float32)
    # two recurrent steps
    for _ in range(2):
        expected = net(torch.from_numpy(state), torch.from_numpy(ref))
        carry, got = lstm_net_apply(params, carry, state, ref)
        np.testing.assert_allclose(
            np.asarray(got), expected.detach().numpy(), rtol=1e-5, atol=1e-6
        )


def test_losses_match_reference():
    torch = __import__("pytest").importorskip("torch")

    load_reference_dynamics()
    import neural_control.drone_loss as ref_loss

    B, k = 4, 10
    states = RNG.randn(B, k, 12).astype(np.float32)
    refs = RNG.randn(B, k, 9).astype(np.float32)
    acts = RNG.rand(B, k, 4).astype(np.float32)

    expected = ref_loss.quad_mpc_loss(
        torch.from_numpy(states), torch.from_numpy(refs), torch.from_numpy(acts)
    ).item()
    got = float(quad_mpc_loss(states, refs, acts))
    assert got == pytest.approx(expected, rel=1e-5)

    s4 = RNG.randn(B, k, 4).astype(np.float32)
    r4 = RNG.randn(B, k, 4).astype(np.float32)
    a1 = RNG.rand(B, k, 1).astype(np.float32)
    expected = ref_loss.cartpole_loss_mpc(
        torch.from_numpy(s4), torch.from_numpy(r4), torch.from_numpy(a1)
    ).item()
    got = float(cartpole_loss_mpc(s4, r4, a1))
    assert got == pytest.approx(expected, rel=1e-5)

    lin_ref = RNG.randn(B, k, 3).astype(np.float32)
    expected = ref_loss.fixed_wing_mpc_loss(
        torch.from_numpy(states), torch.from_numpy(lin_ref), torch.from_numpy(acts)
    ).item()
    got = float(fixed_wing_mpc_loss(states, lin_ref, acts))
    assert got == pytest.approx(expected, rel=1e-5)
