"""Fixed-wing APG training (concurrent mode).

Re-designs ``scripts/train_fixed_wing.py``: the controller is trained by
unrolling the 6-DoF wing for ``horizon`` steps and descending the MPC-style
loss against the linear 12 m/s ramp toward the target direction
(fixed_wing_mpc_loss + WingDataset._compute_target_pos). The dataset is
almost entirely self-play: epoch 0 runs eval rollouts until ``self_play``
samples are collected (train_fixed_wing.py:154-162).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from apg_trajectory_tracking_tpu.data.dataset import (
    make_wing_buffers,
    insert_self_play,
    replace_sampled,
    wing_prepare_data,
    WING_MEAN,
    WING_STD,
)
from apg_trajectory_tracking_tpu.dynamics.fixed_wing import (
    wing_params,
    wing_step,
)
from apg_trajectory_tracking_tpu.envs.wing_env import sample_training_data
from apg_trajectory_tracking_tpu.evaluation.wing_eval import run_eval
from apg_trajectory_tracking_tpu.losses import fixed_wing_mpc_loss
from apg_trajectory_tracking_tpu.models import (
    init_control_net,
    control_net_apply,
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
from apg_trajectory_tracking_tpu.utils.checkpoints import (
    save_train_state,
    restore_train_state,
)
from apg_trajectory_tracking_tpu.utils.logging import ResultsLogger


def build_wing_step(dyn_step, optimizer, dt_train, dt, horizon, mean, std):
    """Concurrent SGD step (train_fixed_wing.py:90-116)."""

    def loss_fn(net_params, dyn_params, states, ref_pos):
        normed, current_state, rel_ref, target_pos = wing_prepare_data(
            states, ref_pos, mean, std, dt=dt, horizon=horizon
        )
        logits = control_net_apply(net_params, normed, rel_ref)
        action_seq = jax.nn.sigmoid(logits).reshape(-1, horizon, 4)

        def body(state, act):
            nxt = dyn_step(dyn_params, state, act, dt_train)
            return nxt, nxt

        _, inter = jax.lax.scan(
            body, current_state, jnp.swapaxes(action_seq, 0, 1),
            unroll=True,
        )
        inter = jnp.swapaxes(inter, 0, 1)
        return fixed_wing_mpc_loss(inter, target_pos, action_seq)

    def step(net_params, opt_state, dyn_params, states, refs):
        loss, grads = jax.value_and_grad(loss_fn)(
            net_params, dyn_params, states, refs
        )
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(net_params, updates), opt_state, loss

    return step


class TrainWing:
    def __init__(self, config=None, seed=0, save_name="test",
                 modified_params=None, eval_modified_params=None,
                 base_model=None, tensorboard=False, mesh=None):
        self.config = cfg = dict(config or load_config("wing"))
        self.dt = cfg["delta_t"]
        self.dt_train = cfg.get("delta_t_train", self.dt)
        self.horizon = cfg["horizon"]
        self.batch_size = cfg["batch_size"]
        self.thresh_div = cfg["thresh_div_start"]
        self.thresh_stable = cfg["thresh_stable_start"]

        mp = modified_params or cfg.get("modified_params", {})
        self.train_dyn = wing_params(mp)
        # eval_modified_params != None is the sampling fine-tune leg
        # (train_fixed_wing.py:240-262, sample_in='eval_env'): the
        # controller trains against the analytic model while eval rollouts
        # AND self-play states come from the mismatched plant
        self.eval_dyn = wing_params(
            eval_modified_params if eval_modified_params is not None else mp
        )

        self.rng = np.random.RandomState(seed)
        self.key = jax.random.PRNGKey(seed)
        self.key, k_net = jax.random.split(self.key)
        # state input = 12 - 3 (position dropped) = 9 features; dense ref
        # branch (train_fixed_wing.py:66-73: Net(state-ref_dim, 1, 3, 40,
        # conv=False))
        self.net = init_control_net(
            k_net, cfg["state_size"] - 3, 1, cfg["ref_dim"],
            cfg["action_dim"] * self.horizon, conv=False,
        )
        self.optimizer = sgd_momentum(cfg["learning_rate_controller"])
        self.opt_state = self.optimizer.init(self.net)

        self.mean = jnp.asarray(WING_MEAN)
        self.std = jnp.asarray(WING_STD)

        # resume / fine-tune (the reference's base_model path,
        # train_fixed_wing.py:47-60)
        if base_model is not None:
            from apg_trajectory_tracking_tpu.utils.checkpoints import (
                resume_name,
            )

            self.net, self.opt_state, base_cfg = restore_train_state(
                base_model, resume_name(base_model, "model_wing"),
                self.net, self.opt_state,
            )
            self.thresh_div = base_cfg.get("thresh_div", self.thresh_div)
            self.thresh_stable = base_cfg.get(
                "thresh_stable", self.thresh_stable
            )

        # buffers: epoch_size sampled + self_play ring slots, seeded with
        # exploration flights (wing_env.py:112-162)
        n_sampled = max(cfg["epoch_size"], 1)
        n_sp = int(cfg["self_play"])
        # under sample_in='eval_env' the exploration flights also come
        # from the mismatched plant (train_fixed_wing.py:40-45)
        sample_dyn = (
            self.eval_dyn if eval_modified_params is not None
            else self.train_dyn
        )
        states, refs = sample_training_data(
            self.rng, n_sampled + n_sp, dt=self.dt, params=sample_dyn
        )
        self.buffers = make_wing_buffers(states, refs, n_sp)

        # data-parallel mesh as the default execution path (see
        # train_quad.py); size-1 degenerate on one chip
        self.mesh = mesh if mesh is not None else auto_mesh(
            self.batch_size, n_sampled + n_sp
        )
        self.net = replicate(self.mesh, self.net)
        self.opt_state = replicate(self.mesh, self.opt_state)
        self.train_dyn = replicate(self.mesh, self.train_dyn)
        self.eval_dyn = replicate(self.mesh, self.eval_dyn)
        self._shard_buffers()

        step = build_wing_step(
            wing_step, self.optimizer, self.dt_train, self.dt, self.horizon,
            self.mean, self.std,
        )
        self._train_epoch = make_sharded_epoch(
            self.mesh, step, donate=True, unroll=4
        )

        self.save_path = os.path.join("trained_models", "wing", save_name)
        self.logger = ResultsLogger(self.save_path,
                                    tensorboard=tensorboard)
        self.best_score = np.inf  # suc_up_down = -1

    def _shard_buffers(self):
        """(Re-)pin data buffers onto the mesh's 'env' axis (see
        TrainQuad._shard_buffers)."""
        states, refs = shard_batch(
            self.mesh, (self.buffers.states, self.buffers.refs)
        )
        self.buffers = self.buffers._replace(states=states, refs=refs)

    def _self_play_insert(self, roll, targets):
        take = self.config.get("self_play_every_x", 2)
        if self.buffers.num_self_play == 0:
            return 0
        states = np.asarray(roll["states"])
        valid = np.asarray(roll["valid"])
        n, T = valid.shape[0], valid.shape[1]
        tg = np.asarray(targets)
        flat_states = states.reshape(-1, 12)
        flat_targets = np.repeat(tg[:, None, :], T, axis=1).reshape(-1, 3)
        mask = valid.reshape(-1)
        sel_states = flat_states[mask][::take]
        sel_targets = flat_targets[mask][::take]
        if len(sel_states) == 0:
            return 0
        self.buffers = insert_self_play(
            self.buffers,
            jnp.asarray(sel_states),
            jnp.asarray(sel_targets),
        )
        self._shard_buffers()
        return len(sel_states)

    def evaluate(self, epoch, nr_test=10):
        # epoch-0 warm-up: fill the self-play ring
        # (train_fixed_wing.py:154-162)
        if epoch == 0:
            collected = 0
            while collected < self.buffers.num_self_play:
                self.key, k = jax.random.split(self.key)
                _, roll, targets = run_eval(
                    self.net, self.eval_dyn, k, self.mean, self.std,
                    nr_test=5, thresh_div=self.thresh_div,
                    thresh_stable=self.thresh_stable, horizon=self.horizon,
                    dt=self.dt, mesh=self.mesh,
                )
                collected += self._self_play_insert(roll, targets)

        self.key, k = jax.random.split(self.key)
        metrics, roll, targets = run_eval(
            self.net, self.eval_dyn, k, self.mean, self.std,
            nr_test=nr_test, thresh_div=self.thresh_div,
            thresh_stable=self.thresh_stable, horizon=self.horizon,
            dt=self.dt, mesh=self.mesh,
        )
        self._self_play_insert(roll, targets)

        # separate test-time eval (train_fixed_wing.py:166-172)
        self.key, k = jax.random.split(self.key)
        test_metrics, _, _ = run_eval(
            self.net, self.eval_dyn, k, self.mean, self.std,
            nr_test=2, thresh_div=self.thresh_div,
            thresh_stable=self.thresh_stable, horizon=self.horizon,
            dt=self.dt, test_time=True, mesh=self.mesh,
        )
        self.logger.log_dict(metrics)
        self.logger.log("mean_divergence", test_metrics["mean_success"])

        # curricula (train_fixed_wing.py:178-188)
        cfg = self.config
        if epoch % 5 == 0 and self.thresh_div < cfg["thresh_div_end"]:
            self.thresh_div += 0.2
        if epoch % 5 == 0 and self.thresh_stable < cfg["thresh_stable_end"]:
            self.thresh_stable += 0.05

        if epoch > 0 and test_metrics["mean_success"] < self.best_score:
            self.best_score = test_metrics["mean_success"]
            self._save()
        return {**metrics, "test_err": test_metrics["mean_success"]}

    def run_epoch(self):
        self.key, k = jax.random.split(self.key)
        idx = shuffled_batches(k, len(self.buffers.states), self.batch_size)
        self.net, self.opt_state, loss = self._train_epoch(
            self.net, self.opt_state, self.train_dyn,
            self.buffers.states, self.buffers.refs, idx,
        )
        loss = float(loss)
        self.logger.log("loss", loss)
        return loss

    def fit(self, nr_epochs=None, nr_test=10, verbose=True):
        nr_epochs = nr_epochs or self.config["nr_epochs"]
        for epoch in range(nr_epochs):
            metrics = self.evaluate(epoch, nr_test=nr_test)
            loss = self.run_epoch()
            if verbose:
                print(
                    f"Epoch {epoch}: loss {loss:.1f} "
                    f"train_err {metrics['mean_success']:.2f} "
                    f"test_err {metrics['test_err']:.2f} "
                    f"thresh {self.thresh_div:.1f}"
                )
        self.finalize()
        return self

    def _save(self, suffix=""):
        save_train_state(
            self.save_path, "model_wing" + suffix, self.net, self.opt_state,
            {
                **self.config,
                "thresh_div": self.thresh_div,
                "thresh_stable": self.thresh_stable,
                "mean": np.asarray(self.mean).tolist(),
                "std": np.asarray(self.std).tolist(),
            },
            backend=self.config.get("checkpoint_backend", "npz"),
        )

    def finalize(self):
        # keep the best-by-criterion model_wing (saved in evaluate());
        # final-epoch weights under a distinct name
        self._save(suffix="_final")
        from apg_trajectory_tracking_tpu.utils.checkpoints import (
            checkpoint_exists,
        )

        if not checkpoint_exists(self.save_path, "model_wing"):
            self._save()
        self.logger.finalize()
