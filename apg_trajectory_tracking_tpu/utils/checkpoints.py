"""Checkpointing: params + optimizer state + curriculum scalars + config.

Replaces the reference's whole-module pickles (``torch.save(self.net)``,
train_base.py:233-259) with a portable scheme: pytree arrays in an .npz
(flattened with jax.tree_util key paths) and the config/normalization stats
in a config.json next to it — same directory layout as the reference
(``trained_models/<system>/<save_name>/``), loading restores both
(evaluate_base.py:11-21).

Two array backends behind the same API:
  * ``npz`` (default) — single-file, human-greppable, fine for the small
    controllers here; the save gathers every array to the host.
  * ``orbax`` — Orbax StandardCheckpointer (SURVEY.md §5.4's TPU-native
    scheme): on a multi-host mesh each process writes only its own array
    shards (no gather-to-host-0), and restore places arrays back onto the
    template's shardings. Select with ``checkpoint_backend: "orbax"`` in a
    trainer config or ``backend="orbax"``; loading auto-detects either
    format, so eval CLIs and ``--base_model`` work across both.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out, treedef


def _orbax_path(save_dir, name):
    # orbax requires an absolute directory path
    return os.path.abspath(os.path.join(save_dir, f"{name}.orbax"))


def checkpoint_exists(save_dir, name):
    """True if ``name`` is saved under ``save_dir`` in either backend."""
    return os.path.exists(os.path.join(save_dir, f"{name}.npz")) \
        or os.path.isdir(_orbax_path(save_dir, name))


def save_checkpoint(save_dir, name, tree, config=None, backend="npz"):
    """Save a pytree of arrays + optional config dict."""
    os.makedirs(save_dir, exist_ok=True)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        # StandardCheckpointer writes asynchronously; block so the
        # checkpoint is durable when save returns (training saves are
        # off the hot path — at most once per epoch)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(_orbax_path(save_dir, name), tree, force=True)
        ckptr.wait_until_finished()
    elif backend == "npz":
        flat, _ = _flatten(tree)
        np.savez(os.path.join(save_dir, f"{name}.npz"), **flat)
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    # on a multi-host mesh only process 0 writes the (replicated) config —
    # orbax coordinates the array shards itself, but N processes dumping
    # the same config.json onto shared storage would interleave
    if config is not None and jax.process_index() == 0:
        clean = {}
        for k, v in config.items():
            if isinstance(v, (np.ndarray, jnp.ndarray)):
                clean[k] = np.asarray(v).tolist()
            else:
                clean[k] = v
        with open(os.path.join(save_dir, "config.json"), "w") as f:
            json.dump(clean, f, default=float)


def load_checkpoint(save_dir, name, template):
    """Load arrays back into the structure of ``template``. Auto-detects
    the backend; an orbax restore places each array onto the template
    leaf's sharding (so a mesh-replicated template comes back replicated,
    an env-sharded buffer comes back sharded)."""
    npz_path = os.path.join(save_dir, f"{name}.npz")
    orbax_dir = _orbax_path(save_dir, name)
    has_npz = os.path.exists(npz_path)
    has_orbax = os.path.isdir(orbax_dir)
    # when a run dir holds BOTH backends (e.g. re-trained with
    # --ckpt_backend orbax over an old npz run), load the newer one
    # rather than silently preferring the stale npz
    if has_orbax and (
        not has_npz
        or os.path.getmtime(orbax_dir) >= os.path.getmtime(npz_path)
    ):
        import orbax.checkpoint as ocp

        def abstract(leaf):
            arr = jnp.asarray(leaf)
            return jax.ShapeDtypeStruct(
                arr.shape, arr.dtype, sharding=getattr(leaf, "sharding", None)
            )

        return ocp.StandardCheckpointer().restore(
            _orbax_path(save_dir, name), jax.tree.map(abstract, template)
        )
    data = np.load(npz_path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        arr = jnp.asarray(data[key])
        leaves.append(arr.astype(leaf.dtype) if hasattr(leaf, "dtype") else arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_config(save_dir):
    with open(os.path.join(save_dir, "config.json")) as f:
        return json.load(f)


def resolve_model_dir(model, system):
    """Resolve an eval-CLI ``-m`` argument: a filesystem path to a
    checkpoint directory (contains config.json) is used as-is; anything
    else is treated as a run name under trained_models/<system>/ (the
    reference's convention, evaluate_base.py:11-21)."""
    if os.path.isfile(os.path.join(model, "config.json")):
        return model
    return os.path.join("trained_models", system, model)


def resume_name(save_dir, base):
    """Checkpoint name to resume training from: the final-epoch snapshot
    (``<base>_final``, written by finalize) when present, else the
    unsuffixed best-by-criterion one. Keeps resume = continue-from-where-
    training-stopped while eval CLIs load the best model by default."""
    if checkpoint_exists(save_dir, f"{base}_final"):
        return f"{base}_final"
    return base


def save_train_state(save_dir, name, net, opt_state, config=None,
                     backend="npz"):
    """Save net + optimizer state (+ config): the full resumable train
    state (the reference resumes from ``base_model`` whole-module pickles,
    train_drone.py:58-68; here optimizer momentum and curriculum scalars
    survive the round trip too)."""
    save_checkpoint(save_dir, name, net, config, backend=backend)
    save_checkpoint(save_dir, f"{name}_opt", opt_state, backend=backend)


def restore_train_state(save_dir, name, net_template, opt_template=None):
    """Restore (net, opt_state, config) saved by :func:`save_train_state`.

    Falls back gracefully: a missing ``<name>_opt.npz`` — or one whose
    structure doesn't match the template (e.g. the checkpoint was trained
    with a different optimizer, like the Adam-based MPC distillation) —
    returns the template optimizer state (fresh momentum), so plain model
    checkpoints, including reference-converted ones, also work as
    ``base_model``.
    """
    net = load_checkpoint(save_dir, name, net_template)
    opt_state = opt_template
    if opt_template is not None and checkpoint_exists(
        save_dir, f"{name}_opt"
    ):
        try:
            opt_state = load_checkpoint(
                save_dir, f"{name}_opt", opt_template
            )
        except (KeyError, ValueError):
            print(f"{name}_opt checkpoint structure doesn't match this "
                  "optimizer; starting with fresh optimizer state")
    cfg = {}
    if os.path.exists(os.path.join(save_dir, "config.json")):
        cfg = load_config(save_dir)
    return net, opt_state, cfg
