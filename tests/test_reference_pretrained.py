"""End-to-end behavioral parity: the reference's SHIPPED pretrained quad
controller (weight-converted to our format, assets/reference_pretrained/)
must fly well inside our framework — this exercises dynamics math,
featurization, network semantics, trajectory preparation, and the evaluator
simultaneously. A large tracking error would mean any one of those diverged
from the reference."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

ASSET_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "reference_pretrained",
)


@pytest.fixture(scope="module")
def small_bank(tmp_path_factory):
    from apg_trajectory_tracking_tpu.trajectory.generate import (
        generate_trajectory_bank,
        load_trajectory_bank,
    )

    d = tmp_path_factory.mktemp("bank_pretrained")
    generate_trajectory_bank(str(d), n_train=6, n_test=0)
    return load_trajectory_bank(str(d))


def test_reference_pretrained_flies(small_bank):
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_params
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import run_eval
    from apg_trajectory_tracking_tpu.models import init_control_net
    from apg_trajectory_tracking_tpu.trajectory.generate import (
        prepare_trajectory,
    )
    from apg_trajectory_tracking_tpu.utils.checkpoints import load_checkpoint

    template = init_control_net(jax.random.PRNGKey(0), 15, 10, 9, 40, conv=True)
    net = load_checkpoint(ASSET_DIR, "model_quad", template)

    refs = np.stack(
        [prepare_trajectory(t, 0.1, 0.3) for t in small_bank]
    )
    refs[:, :, 2] += 3.0
    metrics, _ = run_eval(
        net, quad_params(), jnp.asarray(refs), refs.shape[1] - 10,
        thresh_div=1.0, thresh_stable=1.0, horizon=10, dt=0.1,
        test_time=True,
    )
    # measured 0.033 err / 1.00 stable on a 20-trajectory bank; generous
    # margins for bank variation
    assert metrics["mean_divergence"] < 0.15, metrics
    assert metrics["ratio_stable"] >= 0.5, metrics
