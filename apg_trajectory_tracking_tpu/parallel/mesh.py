"""Device-mesh scale-out for APG training.

The reference is single-process / single-CPU-thread (SURVEY.md 2.9); the
TPU-native scale axis is the environment/batch dimension: thousands of env
instances roll out in lockstep, sharded across chips, with controller
parameters replicated and gradients reduced by XLA collectives over ICI.

Mesh layout: ``('env', 'model')`` — the model axis exists for forward
compatibility but is size 1 (64-neuron MLP controllers have nothing to
shard; see SURVEY.md 2.9: "expose a mesh abstraction where a model axis
exists but is size 1").

Everything goes through ``jax.jit`` with sharding annotations: batch args
sharded on 'env', params replicated; XLA inserts the psum for the gradient
all-reduce. Multi-host: call ``jax.distributed.initialize()`` before
building the mesh and the same code spans hosts (ICI within a slice, DCN
across slices).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, model_parallel=1):
    """Mesh over the first ``n_devices`` devices with axes ('env', 'model')."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devs = np.asarray(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(devs, axis_names=("env", "model"))


def shard_batch(mesh, tree):
    """Place leading-axis-sharded copies of batch arrays on the mesh."""
    sharding = NamedSharding(mesh, P("env"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicate(mesh, tree):
    """Replicate parameters/optimizer state across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def make_sharded_train_step(mesh, step_fn):
    """Wrap a ``(params, opt_state, dyn_params, states, refs) ->
    (params, opt_state, loss)`` step with mesh shardings.

    Params/opt-state/dynamics replicated; (states, refs) sharded on 'env'.
    The loss is a sum over the batch, so XLA emits one psum over 'env' for
    the gradients (data parallelism) — no hand-written collectives.
    """
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("env"))
    return jax.jit(
        step_fn,
        in_shardings=(rep, rep, rep, shard, shard),
        out_shardings=(rep, rep, rep),
    )


def make_sharded_eval(mesh, eval_fn, static_argnames=()):
    """Shard a batched closed-loop eval over test episodes on 'env'."""
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("env"))
    return jax.jit(
        eval_fn,
        in_shardings=(rep, rep, shard),
        static_argnames=static_argnames,
    )


def host_local_rng(seed):
    """Deterministic per-host numpy RNG for host-sharded data sampling
    (SURVEY.md 5.8): each host draws a disjoint stream so trajectory
    resampling / self-play collection shard naturally across processes
    while staying reproducible. On a single host this is just
    ``RandomState(seed)``."""
    return np.random.RandomState(seed + 7919 * jax.process_index())


def host_local_fold(key):
    """Same for jax PRNG keys: fold the process index into the key."""
    return jax.random.fold_in(key, jax.process_index())
