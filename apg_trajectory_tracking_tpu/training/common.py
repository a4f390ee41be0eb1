"""Shared training machinery: optimizers, epoch scans, config loading.

The reference's epoch loop (train_base.py:188-218) iterates a torch
DataLoader in python, one optimizer step per batch. Here a whole epoch is a
single jitted ``lax.scan`` over shuffled minibatches — one device launch per
epoch instead of one per batch.
"""

import json
import os

import jax
import jax.numpy as jnp
import optax


def sgd_momentum(lr):
    """SGD with momentum 0.9, matching the reference's optimizer
    (train_base.py:139-143: optim.SGD(lr, momentum=0.9))."""
    return optax.sgd(lr, momentum=0.9)


def shuffled_batches(key, n_data, batch_size):
    """Random permutation reshaped to (n_batches, batch_size); the tail that
    doesn't fill a batch is dropped (torch DataLoader default keeps it, but
    a ragged final batch would force a recompile). No sample is starved:
    every trainer passes a FRESH per-epoch key, so the dropped tail is a
    different random subset each epoch and every sample is trained on
    across epochs (and the buffers are resampled every few epochs on top)."""
    n_batches = n_data // batch_size
    perm = jax.random.permutation(key, n_data)[: n_batches * batch_size]
    return perm.reshape(n_batches, batch_size)


def epoch_scan(step_fn, params, opt_state, batches_idx, *data_arrays):
    """Run ``step_fn`` over all minibatches in one lax.scan.

    Args:
        step_fn: (params, opt_state, *batch_arrays) -> (params, opt_state, loss)
        batches_idx: (n_batches, B) int array of indices into data_arrays.
        data_arrays: arrays indexed along axis 0.
    Returns:
        (params, opt_state, mean_loss)
    """

    def body(carry, idx):
        params, opt_state = carry
        batch = tuple(arr[idx] for arr in data_arrays)
        params, opt_state, loss = step_fn(params, opt_state, *batch)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(
        body, (params, opt_state), batches_idx
    )
    return params, opt_state, jnp.mean(losses)


def load_config(system, overrides=None, config_dir=None):
    """Load configs/<system>_config.json (same keys as the reference's
    configs/) and apply overrides."""
    if config_dir is None:
        config_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            "configs",
        )
    with open(os.path.join(config_dir, f"{system}_config.json")) as f:
        cfg = json.load(f)
    if overrides:
        cfg.update(overrides)
    return cfg
