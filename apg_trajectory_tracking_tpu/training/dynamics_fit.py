"""Dynamics-model fitting and the dynamics/controller alternation.

Re-designs the reference's adaptation machinery:
  * ``train_dynamics_model`` (train_base.py:160-186): fit the learnt
    dynamics f_hat to the (mismatched) eval dynamics on one-step
    transitions, loss = ||f_hat(s,a) - f_eval(s,a)||^2 + l2 * ||residual W||;
  * ``run_dynamics`` (train_base.py:334-375): train dynamics for the first
    ``train_dyn_for_epochs`` epochs, then train the controller against the
    adapted f_hat;
  * ``not_trainable`` (cartpole_dynamics.py:124-137): freezing the physical
    parameters so only the residual adapts — here a gradient mask.

Actions for the dynamics-fit batches come from the current controller
(run_epoch, train_base.py:188-210), so the model is fit on-distribution.
"""

import jax
import jax.numpy as jnp
import optax

from apg_trajectory_tracking_tpu.dynamics.learnt import (
    LearntDynamics,
    residual_l2,
)


def _labels_like(ld: LearntDynamics, train_base):
    """Per-leaf labels: residual always trains ('train'); base params get
    'base' if trainable, 'freeze' otherwise.

    ``train_base`` may be a bool (all-or-nothing, the reference's
    params_trainable flag) or a collection of base FIELD NAMES for a
    targeted sysid mask (the pattern of scripts/swingup_adapt.py, which
    identifies only ``length``) — the base pytree must then be a
    NamedTuple."""
    if isinstance(train_base, bool):
        base = jax.tree_util.tree_map(
            lambda _: "base" if train_base else "freeze", ld.base
        )
    else:
        names = set(train_base)
        unknown = names - set(ld.base._fields)
        if unknown:
            raise ValueError(
                f"train_base names {sorted(unknown)} not in base fields "
                f"{ld.base._fields}"
            )
        base = type(ld.base)(**{
            f: jax.tree_util.tree_map(
                lambda _: "base" if f in names else "freeze",
                getattr(ld.base, f),
            )
            for f in ld.base._fields
        })
    return LearntDynamics(
        base=base,
        residual=jax.tree_util.tree_map(lambda _: "train", ld.residual),
        action_transform=(
            None
            if ld.action_transform is None
            else jax.tree_util.tree_map(lambda _: "train", ld.action_transform)
        ),
    )


def masked_dynamics_optimizer(lr, ld: LearntDynamics, train_base=False,
                              base_lr=None):
    """Masked optimizer for the dynamics fit: trainable leaves step,
    frozen leaves get zero updates (optax.masked would pass raw gradients
    through for the complement, so multi_transform + set_to_zero is
    required).

    ``train_base`` selects the trainable physical parameters (bool or
    field names, see :func:`_labels_like`); ``base_lr`` gives them their
    own Adam learning rate — physical constants like kinv (~16.6) live on
    a very different scale than residual MLP weights, and Adam's step
    magnitude is bounded by its lr, so identifying an O(5) parameter shift
    at the residual's 1e-3 would take ~5000 steps.

    Deliberate deviation from the reference (SGD momentum 0.9,
    train_base.py:146-150): Adam with global-norm clipping. The fit problem
    is badly scaled across systems (cartpole velocities ~20, quad states
    ~0.3) and across layers of the residual; fixed-lr SGD either diverges
    on one system or crawls on the other, while Adam's per-parameter
    scaling fits both with the same defaults."""
    labels = _labels_like(ld, train_base)
    return optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.multi_transform(
            {
                "train": optax.adam(lr),
                "base": optax.adam(base_lr if base_lr is not None else lr),
                "freeze": optax.set_to_zero(),
            },
            labels,
        ),
    )


def build_dynamics_fit_step(
    learnt_step, eval_step, optimizer, dt, l2_lambda=0.0
):
    """One SGD step fitting f_hat to f_eval on a batch of (s, a).

    Args:
        learnt_step: (ld, states, actions, dt) -> next states.
        eval_step: (eval_params, states, actions, dt) -> next states.
    Returns:
        step(ld, opt_state, eval_params, states, actions)
            -> (ld, opt_state, loss)
    """

    def loss_fn(ld, eval_params, states, actions):
        pred = learnt_step(ld, states, actions, dt)
        target = eval_step(eval_params, states, actions, dt)
        loss = jnp.sum((pred - target) ** 2)
        if l2_lambda > 0:
            loss = loss + l2_lambda * residual_l2(ld.residual)
        return loss

    def step(ld, opt_state, eval_params, states, actions):
        loss, grads = jax.value_and_grad(loss_fn)(
            ld, eval_params, states, actions
        )
        updates, opt_state = optimizer.update(grads, opt_state, ld)
        return optax.apply_updates(ld, updates), opt_state, loss

    return step


def fit_dynamics_epoch(
    fit_step, ld, opt_state, eval_params, states, actions_fn, batches_idx
):
    """Scan the fit step over minibatches; actions come from
    ``actions_fn(states_batch)`` (the current controller)."""

    def body(carry, idx):
        ld_, opt_ = carry
        s = states[idx]
        a = actions_fn(s)
        ld_, opt_, loss = fit_step(ld_, opt_, eval_params, s, a)
        return (ld_, opt_), loss

    (ld, opt_state), losses = jax.lax.scan(
        body, (ld, opt_state), batches_idx
    )
    return ld, opt_state, jnp.mean(losses)
