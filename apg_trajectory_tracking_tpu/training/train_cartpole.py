"""Cartpole APG training (concurrent mode).

Re-designs ``scripts/train_cartpole.py``: the controller is trained by
unrolling the differentiable cartpole for ``horizon`` steps from sampled
states and descending the MPC-style loss against a linear ramp-to-zero
reference (make_reference, train_cartpole.py:103-110). A full epoch runs as
one jitted scan over minibatches; evaluation is the batched closed-loop eval.
Curriculum: the divergence threshold used by the data sampler grows every 3
epochs (evaluate_model, train_cartpole.py:194-199).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.dynamics.cartpole import (
    cartpole_params,
    cartpole_step,
)
from apg_trajectory_tracking_tpu.envs.cartpole_env import construct_states
from apg_trajectory_tracking_tpu.evaluation.cartpole_eval import (
    evaluate_balance,
    evaluate_swingup,
)
from apg_trajectory_tracking_tpu.losses import cartpole_loss_mpc
from apg_trajectory_tracking_tpu.models import (
    init_cartpole_net,
    cartpole_net_apply,
)
from apg_trajectory_tracking_tpu.parallel.mesh import (
    auto_mesh,
    make_sharded_epoch,
    replicate,
    shard_batch,
)
from apg_trajectory_tracking_tpu.training.common import (
    load_config,
    sgd_momentum,
    shuffled_batches,
)
from apg_trajectory_tracking_tpu.utils.checkpoints import save_train_state
from apg_trajectory_tracking_tpu.utils.logging import ResultsLogger


def make_reference(states, horizon):
    """Linear ramp from the current state to zero over the horizon
    (train_cartpole.py:103-110; final row stays zero)."""
    ks = jnp.arange(horizon, dtype=jnp.float32)
    factors = jnp.where(ks < horizon - 1, 1.0 - ks / (horizon - 1), 0.0)
    return states[:, None, :] * factors[None, :, None]


def build_train_step(dyn_step, dyn_params, optimizer, dt, horizon):
    """One SGD step on a minibatch of states (train_cartpole.py:118-165)."""

    def loss_fn(net_params, states):
        actions = cartpole_net_apply(net_params, states)
        action_seq = actions.reshape(-1, horizon, 1)
        ref_states = make_reference(states, horizon)

        def body(state, act):
            nxt = dyn_step(dyn_params, state, act, dt)
            return nxt, nxt

        _, inter = jax.lax.scan(
            body, states, jnp.swapaxes(action_seq, 0, 1), unroll=True
        )
        inter = jnp.swapaxes(inter, 0, 1)
        return cartpole_loss_mpc(inter, ref_states, action_seq)

    def step(net_params, opt_state, batch_states):
        loss, grads = jax.value_and_grad(loss_fn)(net_params, batch_states)
        updates, opt_state = optimizer.update(grads, opt_state)
        import optax

        net_params = optax.apply_updates(net_params, updates)
        return net_params, opt_state, loss

    return step


class TrainCartpole:
    """Host-side orchestration; all compute is jitted device code."""

    def __init__(self, config=None, swingup=True, seed=0, save_name="test",
                 base_model=None, tensorboard=False, mesh=None):
        self.config = config or load_config("cartpole")
        self.swingup = swingup
        cfg = self.config
        self.dt = cfg["delta_t"]
        self.horizon = cfg["horizon"]
        self.batch_size = cfg["batch_size"]
        self.thresh_div = cfg["thresh_div_start"]

        self.train_dyn = cartpole_params(cfg.get("modified_params", {}))
        self.eval_dyn = cartpole_params(cfg.get("modified_params", {}))

        self.key = jax.random.PRNGKey(seed)
        self.key, k_net, k_data = jax.random.split(self.key, 3)
        self.net = init_cartpole_net(
            k_net, cfg["state_size"], self.horizon * cfg["action_dim"]
        )
        self.optimizer = sgd_momentum(cfg["learning_rate_controller"])
        self.opt_state = self.optimizer.init(self.net)

        # resume / fine-tune (the reference's base_model path,
        # train_cartpole.py:47-56)
        if base_model is not None:
            from apg_trajectory_tracking_tpu.utils.checkpoints import (
                restore_train_state,
                resume_name,
            )

            self.net, self.opt_state, base_cfg = restore_train_state(
                base_model, resume_name(base_model, "model_cartpole"),
                self.net, self.opt_state,
            )
            self.thresh_div = base_cfg.get("thresh_div", self.thresh_div)

        self.data = construct_states(
            k_data, cfg["sample_data"], self.dt, self.thresh_div,
            self.train_dyn,
        )

        # data-parallel mesh as the default execution path (see
        # train_quad.py); size-1 degenerate on one chip. The 10-episode
        # 4-dim-state evaluators stay replicated — there is no parallel
        # work in them worth a collective.
        self.mesh = mesh if mesh is not None else auto_mesh(
            self.batch_size, len(self.data)
        )
        self.net = replicate(self.mesh, self.net)
        self.opt_state = replicate(self.mesh, self.opt_state)
        self.data = shard_batch(self.mesh, self.data)

        self._step = build_train_step(
            cartpole_step, self.train_dyn, self.optimizer, self.dt,
            self.horizon,
        )
        self._train_epoch = make_sharded_epoch(
            self.mesh, self._step, n_data=1, dyn_arg=False, donate=True,
            unroll=4,
        )

        self.save_path = os.path.join("trained_models", "cartpole", save_name)
        self.logger = ResultsLogger(self.save_path,
                                    tensorboard=tensorboard)
        self.best_score = np.inf  # suc_up_down = -1: lower mean_vel is better

    def run_epoch(self):
        self.key, k = jax.random.split(self.key)
        idx = shuffled_batches(k, len(self.data), self.batch_size)
        self.net, self.opt_state, loss = self._train_epoch(
            self.net, self.opt_state, self.data, idx
        )
        loss = float(loss)
        self.logger.log("loss", loss)
        return loss

    def evaluate(self, epoch):
        self.key, k = jax.random.split(self.key)
        if self.swingup:
            res = evaluate_swingup(
                self.net, self.eval_dyn, k, dt=self.dt, horizon=self.horizon
            )
        else:
            res = evaluate_balance(
                self.net, self.eval_dyn, dt=self.dt, horizon=self.horizon,
                thresh_div=0.21,
            )
        res = {k_: float(v) for k_, v in res.items()
               if not k_.endswith("_per_episode")}
        self.logger.log_dict(res)
        self.logger.log("mean_success", res["mean_vel"])
        self.logger.log("std_success", res["std_vel"])
        self.logger.log("evaluate_at", epoch)

        # curriculum (train_cartpole.py:194-199)
        cfg = self.config
        if epoch % 3 == 0 and self.thresh_div < cfg["thresh_div_end"]:
            self.thresh_div += cfg["thresh_div_step"]

        # resample (train_cartpole.py:201-205)
        if (epoch + 1) % cfg["resample_every"] == 0:
            self.key, k = jax.random.split(self.key)
            self.data = shard_batch(self.mesh, construct_states(
                k, cfg["sample_data"], self.dt, self.thresh_div,
                self.train_dyn,
            ))

        # save best (train_base.py:233-244, suc_up_down=-1)
        if epoch > 0 and res["mean_vel"] < self.best_score:
            self.best_score = res["mean_vel"]
            save_train_state(
                self.save_path, "model_cartpole", self.net, self.opt_state,
                {**cfg, "thresh_div": self.thresh_div},
                backend=cfg.get("checkpoint_backend", "npz"),
            )
        return res

    def fit(self, nr_epochs=None, verbose=True):
        nr_epochs = nr_epochs or self.config["nr_epochs"]
        for epoch in range(nr_epochs):
            res = self.evaluate(epoch)
            loss = self.run_epoch()
            if verbose:
                print(
                    f"Epoch {epoch}: loss {loss:.2f}, "
                    + ", ".join(f"{k} {v:.3f}" for k, v in res.items())
                )
        self.finalize()
        return self

    def finalize(self):
        # keep the best-by-criterion model_cartpole (saved in evaluate());
        # final-epoch weights under a distinct name
        from apg_trajectory_tracking_tpu.utils.checkpoints import (
            checkpoint_exists,
        )

        backend = self.config.get("checkpoint_backend", "npz")
        save_train_state(
            self.save_path, "model_cartpole_final", self.net, self.opt_state,
            {**self.config, "thresh_div": self.thresh_div}, backend=backend,
        )
        if not checkpoint_exists(self.save_path, "model_cartpole"):
            save_train_state(
                self.save_path, "model_cartpole", self.net, self.opt_state,
                {**self.config, "thresh_div": self.thresh_div},
                backend=backend,
            )
        self.logger.finalize()
