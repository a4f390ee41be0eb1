"""Import the reference implementation (read-only, at /root/reference) as a
numerical test oracle.

The reference's torch dynamics import ``casadi`` (and build symbolic params in
``__init__``) even though the torch compute path never touches them. We stub
``casadi`` so the torch math — the behavior we must match — can run as-is.

Tests that use this module skip automatically when the reference checkout is
absent (e.g. on a user machine).
"""

import os
import sys
import types

import pytest

REFERENCE_PATH = os.environ.get("APG_REFERENCE_PATH", "/root/reference")


class _StubSX:
    """Minimal stand-in for casadi.SX: stores whatever it is given."""

    def __init__(self, value=None):
        self.value = value

    @staticmethod
    def sym(*args, **kwargs):
        return _StubSX()

    def __mul__(self, other):
        return _StubSX()

    __rmul__ = __mul__
    __truediv__ = __mul__
    __rtruediv__ = __mul__
    __add__ = __mul__
    __radd__ = __mul__
    __sub__ = __mul__
    __rsub__ = __mul__


def _install_casadi_stub():
    if "casadi" in sys.modules:
        return
    stub = types.ModuleType("casadi")
    stub.SX = _StubSX
    stub.MX = _StubSX
    for name in (
        "vertcat", "cos", "sin", "tan", "atan", "sqrt", "cross",
        "Function", "constpow", "nlpsol",
    ):
        setattr(stub, name, lambda *a, **k: _StubSX())
    stub.pi = 3.141592653589793
    stub.inf = float("inf")
    sys.modules["casadi"] = stub


def load_reference_dynamics():
    """Return the reference dynamics modules, or skip the calling test."""
    import os

    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference checkout not available")
    _install_casadi_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        from neural_control.dynamics import quad_dynamics_flightmare
        from neural_control.dynamics import quad_dynamics_simple
        from neural_control.dynamics import cartpole_dynamics
        from neural_control.dynamics import fixed_wing_dynamics
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference import failed: {exc}")
    return types.SimpleNamespace(
        quad=quad_dynamics_flightmare,
        quad_simple=quad_dynamics_simple,
        cartpole=cartpole_dynamics,
        wing=fixed_wing_dynamics,
    )
