"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` for single-host multi-device
simulation. The TPU harness in this container pins ``jax_platforms`` at
interpreter startup (sitecustomize), so plain env vars are not enough —
we override via ``jax.config`` and clear any already-initialized backends.
"""

import os

# headless plotting everywhere: on a workstation with a display the live
# viewer would otherwise open real windows and pace to wall-clock.
# matplotlib is an optional extra — without it the viz tests skip
# themselves but the rest of the suite must still collect and run
os.environ.setdefault("MPLBACKEND", "Agg")
try:
    import matplotlib

    matplotlib.use("Agg", force=True)
except ImportError:  # pragma: no cover
    pass

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from apg_trajectory_tracking_tpu.utils.backend import (  # noqa: E402
    force_cpu_backend,
)

force_cpu_backend()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_bank(tmp_path_factory):
    """Small generated trajectory bank shared across test modules."""
    from apg_trajectory_tracking_tpu.trajectory.generate import (
        generate_trajectory_bank,
    )

    d = tmp_path_factory.mktemp("bank")
    generate_trajectory_bank(str(d), n_train=4, n_test=2)
    return str(d)
