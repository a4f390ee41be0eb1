"""apg_trajectory_tracking_tpu — TPU-native Analytic Policy Gradient control learning.

A from-scratch JAX/XLA re-design of the capabilities of
``lis-epfl/apg_trajectory_tracking`` (ICRA 2023, arXiv 2209.13052):
training neural controllers for CartPole, quadrotor, and fixed-wing drones by
backpropagating through differentiable rigid-body dynamics over a k-step
horizon, with curriculum learning on tracking divergence and speed.

Design principles (TPU-first, not a port):
  * Dynamics are pure, batched, jit-able step functions
    ``step(params, state, action, dt) -> next_state`` — thousands of env
    instances roll out in lockstep under ``jax.vmap`` + ``lax.scan``.
  * Training epochs compile to a single XLA program (``lax.scan`` over
    minibatches, BPTT through the dynamics via reverse-mode scan).
  * Evaluation is a masked fixed-length scan (divergence reset / early
    termination become ``jnp.where`` selects, not Python control flow).
  * Scale-out uses a ``jax.sharding.Mesh`` with the env/batch axis sharded
    and controller parameters replicated; gradient reduction is XLA psum.

Reference parity map (see SURVEY.md): every public symbol's docstring cites
the reference file:line it mirrors.
"""

__version__ = "0.1.0"

from apg_trajectory_tracking_tpu.dynamics import (  # noqa: F401
    cartpole_params,
    cartpole_step,
    quad_params,
    quad_step,
    quad_step_simple,
    wing_params,
    wing_step,
)
