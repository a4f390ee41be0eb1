"""REAL multi-process ("multi-host") validation: two coordinated JAX
processes, gloo cross-process collectives, host-local data shards —
the deployment path of docs/DISTRIBUTED.md, not the in-process virtual
mesh the rest of the suite uses."""

import os
import re
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_epoch_matches_single_process():
    """scripts/multihost_smoke.py with 2 workers: both processes report
    identical loss + param checksum (the psum crossed process boundaries),
    and the loss equals a single-process mesh run on the same data."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py"),
         "--nproc", "2", "--coordinator", "127.0.0.1:29531"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": ""},
    )
    assert out.returncode == 0, out.stdout + out.stderr
    losses = set(re.findall(r"epoch_loss ([\d.]+)", out.stdout))
    assert len(losses) == 1, out.stdout

    # single-process reference on the identical global data / batching
    from jax.sharding import NamedSharding, PartitionSpec as P

    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.models import init_control_net
    from apg_trajectory_tracking_tpu.parallel.mesh import (
        make_mesh,
        make_sharded_epoch,
        replicate,
    )
    from apg_trajectory_tracking_tpu.training.common import (
        sgd_momentum,
        shuffled_batches,
    )
    from apg_trajectory_tracking_tpu.training.train_quad import (
        build_concurrent_step,
    )

    mesh = make_mesh(8)
    net = init_control_net(jax.random.PRNGKey(0), 15, 10, 9, 40, conv=True)
    opt = sgd_momentum(1e-4)
    opt_state = opt.init(net)
    step = build_concurrent_step(quad_step, opt, 0.1, 10, 4)
    epoch = make_sharded_epoch(mesh, step)
    rng = np.random.RandomState(7)
    states = rng.randn(64, 12).astype(np.float32)
    refs = rng.randn(64, 10, 9).astype(np.float32)
    sh = NamedSharding(mesh, P("env"))
    idx = shuffled_batches(jax.random.PRNGKey(1), 64, 8)
    _, _, loss = epoch(
        replicate(mesh, net), replicate(mesh, opt_state),
        replicate(mesh, quad_params()),
        jax.device_put(jnp.asarray(states), sh),
        jax.device_put(jnp.asarray(refs), sh), idx,
    )
    assert float(loss) == pytest.approx(float(losses.pop()), rel=1e-4)
