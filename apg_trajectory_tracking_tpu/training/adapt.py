"""Adaptation experiments: dynamics mismatch -> fit residual -> retrain
controller against the adapted model.

The three reference experiment drivers, each implemented below:
  * cartpole 'adapt' with wind=0.5 (train_cartpole.py:245-263, -t adapt)
    -> :class:`TrainCartpoleAdapt`;
  * quad train_dynamics (train_drone.py:260-279) -> :class:`TrainQuadAdapt`;
  * wing train_dynamics (train_fixed_wing.py:216-237)
    -> :class:`TrainWingAdapt`;
plus the run_dynamics alternation schedule (train_base.py:334-375) and,
for the wing, the sampling fine-tune leg (train_fixed_wing.py:240-262) via
``TrainWing(eval_modified_params=...)``.
"""

import numpy as np
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.dynamics.cartpole import (
    cartpole_params,
    cartpole_step,
)
from apg_trajectory_tracking_tpu.dynamics.learnt import (
    learnt_step as _generic_learnt_step,
    make_learnt_cartpole,
)
from apg_trajectory_tracking_tpu.models import cartpole_net_apply
from apg_trajectory_tracking_tpu.training.common import (
    load_config,
    shuffled_batches,
)
from apg_trajectory_tracking_tpu.training.dynamics_fit import (
    build_dynamics_fit_step,
    fit_dynamics_epoch,
    masked_dynamics_optimizer,
)
from apg_trajectory_tracking_tpu.training.train_cartpole import (
    TrainCartpole,
    build_train_step,
)


def cartpole_learnt_step(ld, states, actions, dt):
    return _generic_learnt_step(cartpole_step, ld, states, actions, dt)


class TrainCartpoleAdapt(TrainCartpole):
    """Cartpole dynamics-adaptation experiment (-t adapt).

    Train dynamics = analytic cartpole + residual MLP (physical params
    frozen unless ``train_base_params``); eval dynamics = cartpole with a
    mismatch (default wind=0.5, train_cartpole.py:311). The first
    ``train_dyn_for_epochs`` epochs fit the residual on one-step
    transitions driven by the current controller; afterwards the controller
    trains against the adapted model and is evaluated in the mismatched env.
    """

    def __init__(
        self,
        config=None,
        modified_params=None,
        train_base_params=False,
        seed=0,
        save_name="adapt",
        mesh=None,
    ):
        super().__init__(config, swingup=False, seed=seed,
                         save_name=save_name, mesh=mesh)
        cfg = self.config
        if modified_params is None:
            modified_params = {"wind": 0.5}
        self.eval_dyn = cartpole_params(modified_params)

        self.key, k_ld = jax.random.split(self.key)
        self.ld, self.ld_step = make_learnt_cartpole(k_ld, std=1e-4)
        self.dyn_optimizer = masked_dynamics_optimizer(
            cfg["learning_rate_dynamics"], self.ld,
            train_base=train_base_params,
            base_lr=cfg.get("learning_rate_base"),
        )
        self.dyn_opt_state = self.dyn_optimizer.init(self.ld)

        fit_step = build_dynamics_fit_step(
            cartpole_learnt_step,
            cartpole_step,
            self.dyn_optimizer,
            self.dt,
            l2_lambda=cfg.get("l2_lambda", 0.0),
        )

        horizon = self.horizon

        def actions_fn(states):
            # first action of the controller's sequence
            # (train_base.py:163-168 uses action_seq[:, 0])
            acts = cartpole_net_apply(self.net, states)
            return acts.reshape(-1, horizon, 1)[:, 0]

        self._fit_epoch = jax.jit(
            lambda ld, opt, evalp, states, idx: fit_dynamics_epoch(
                fit_step, ld, opt, evalp, states, actions_fn, idx
            )
        )

        # controller step against the learnt dynamics
        ctrl_step = build_train_step(
            cartpole_learnt_step, self.ld, self.optimizer, self.dt, horizon
        )
        # note: ld is a traced argument so the controller sees updates
        from apg_trajectory_tracking_tpu.losses import cartpole_loss_mpc
        from apg_trajectory_tracking_tpu.training.train_cartpole import (
            make_reference,
        )
        import optax

        def ctrl_loss(net_params, ld, states):
            actions = cartpole_net_apply(net_params, states)
            action_seq = actions.reshape(-1, horizon, 1)
            ref_states = make_reference(states, horizon)

            def body(state, act):
                nxt = cartpole_learnt_step(ld, state, act, self.dt)
                return nxt, nxt

            _, inter = jax.lax.scan(
                body, states, jnp.swapaxes(action_seq, 0, 1), unroll=True
            )
            return cartpole_loss_mpc(
                jnp.swapaxes(inter, 0, 1), ref_states, action_seq
            )

        def ctrl_step_fn(net_params, opt_state, ld, states):
            loss, grads = jax.value_and_grad(ctrl_loss)(
                net_params, ld, states
            )
            updates, opt_state = self.optimizer.update(grads, opt_state)
            return optax.apply_updates(net_params, updates), opt_state, loss

        def ctrl_epoch(net_params, opt_state, ld, data, idx):
            def body(carry, i):
                p, o = carry
                p, o, loss = ctrl_step_fn(p, o, ld, data[i])
                return (p, o), loss

            (net_params, opt_state), losses = jax.lax.scan(
                body, (net_params, opt_state), idx
            )
            return net_params, opt_state, jnp.mean(losses)

        self._ctrl_epoch_learnt = jax.jit(ctrl_epoch)

    def run_dynamics_epoch(self):
        self.key, k = jax.random.split(self.key)
        idx = shuffled_batches(k, len(self.data), self.batch_size)
        self.ld, self.dyn_opt_state, loss = self._fit_epoch(
            self.ld, self.dyn_opt_state, self.eval_dyn, self.data, idx
        )
        loss = float(loss)
        self.logger.log("loss_dyn", loss)
        return loss

    def run_controller_epoch_learnt(self):
        self.key, k = jax.random.split(self.key)
        idx = shuffled_batches(k, len(self.data), self.batch_size)
        self.net, self.opt_state, loss = self._ctrl_epoch_learnt(
            self.net, self.opt_state, self.ld, self.data, idx
        )
        loss = float(loss)
        self.logger.log("loss", loss)
        return loss

    def run_dynamics(self, nr_epochs=None, train_dyn_for_epochs=None,
                     train_dyn_every=1, verbose=True):
        """The alternation schedule (train_base.py:334-375)."""
        cfg = self.config
        if nr_epochs is None:
            nr_epochs = cfg["nr_epochs"]
        train_dyn_for_epochs = (
            train_dyn_for_epochs
            if train_dyn_for_epochs is not None
            else cfg.get("train_dyn_for_epochs", 10)
        )
        for epoch in range(nr_epochs):
            res = self.evaluate(epoch)
            if (
                epoch <= train_dyn_for_epochs
                and epoch % train_dyn_every == 0
            ):
                loss = self.run_dynamics_epoch()
                what = "dynamics"
            else:
                loss = self.run_controller_epoch_learnt()
                what = "controller"
            if verbose:
                print(
                    f"Epoch {epoch} [{what}]: loss {loss:.3f} "
                    + ", ".join(f"{k} {v:.3f}" for k, v in res.items())
                )
        self.finalize()
        return self

    def evaluate(self, epoch):
        """Evaluate in the MISMATCHED env (balance task)."""
        from apg_trajectory_tracking_tpu.evaluation.cartpole_eval import (
            evaluate_balance,
        )

        res = evaluate_balance(
            self.net, self.eval_dyn, dt=self.dt, horizon=self.horizon
        )
        res = {k: float(v) for k, v in res.items()
               if not k.endswith("_per_episode")}
        self.logger.log_dict(res)
        self.logger.log("mean_success", res["mean_vel"])
        self.logger.log("std_success", res["std_vel"])

        cfg = self.config
        if epoch % 3 == 0 and self.thresh_div < cfg["thresh_div_end"]:
            self.thresh_div += cfg["thresh_div_step"]
        if (epoch + 1) % cfg["resample_every"] == 0:
            from apg_trajectory_tracking_tpu.envs.cartpole_env import (
                construct_states,
            )

            self.key, k = jax.random.split(self.key)
            self.data = construct_states(
                k, cfg["sample_data"], self.dt, self.thresh_div,
                self.train_dyn,
            )
        return res

    def dynamics_gap(self, n=256):
        """Mean one-step error of f_hat vs the mismatched env vs the
        un-adapted analytic model (the 'dynamic gap' print of
        evaluate_cartpole.py:240-248)."""
        self.key, k1, k2 = jax.random.split(self.key, 3)
        states = jax.random.normal(k1, (n, 4)) * jnp.asarray(
            [1.0, 1.0, 0.5, 1.0]
        )
        actions = jax.random.uniform(k2, (n, 1), minval=-1.0, maxval=1.0)
        target = cartpole_step(self.eval_dyn, states, actions, self.dt)
        adapted = cartpole_learnt_step(self.ld, states, actions, self.dt)
        analytic = cartpole_step(self.train_dyn, states, actions, self.dt)
        return (
            float(jnp.mean(jnp.abs(adapted - target))),
            float(jnp.mean(jnp.abs(analytic - target))),
        )


# ---------------------------------------------------------------------------
# quad adaptation (train_drone.py:260-279)
# ---------------------------------------------------------------------------

from apg_trajectory_tracking_tpu.dynamics.quad import (  # noqa: E402
    quad_step,
)
from apg_trajectory_tracking_tpu.dynamics.learnt import (  # noqa: E402
    make_learnt_quad,
)


def quad_learnt_step(ld, states, actions, dt):
    return _generic_learnt_step(quad_step, ld, states, actions, dt)


class TrainQuadAdapt:
    """Quad dynamics-adaptation experiment (train_drone.py:260-279):
    starting from a pretrained controller, fit a residual dynamics model to
    a mismatched environment (``modified_params``), then keep training the
    controller against the adapted model; eval rollouts + self-play happen
    in the learnt env (the reference's ``sample_in='train_env'``)."""

    def __init__(
        self,
        config=None,
        modified_params=None,
        base_model=None,
        train_base_params=False,
        seed=0,
        save_name="adapt_quad",
        data_dir="data/traj_data",
        mesh=None,
    ):
        from apg_trajectory_tracking_tpu.training.train_quad import (
            TrainQuad,
            build_concurrent_step,
        )
        from apg_trajectory_tracking_tpu.data.dataset import (
            quad_prepare_data,
        )
        from apg_trajectory_tracking_tpu.models import control_net_apply

        modified_params = modified_params or {
            "translational_drag": [0.3, 0.3, 0.3]
        }
        self.inner = inner = TrainQuad(
            config, seed=seed, save_name=save_name, data_dir=data_dir,
            eval_modified_params=modified_params, curriculum=False,
            base_model=base_model, mesh=mesh,
        )
        cfg = inner.config

        inner.key, k_ld = jax.random.split(inner.key)
        self.ld, _ = make_learnt_quad(k_ld, std=1e-4)
        self.dyn_optimizer = masked_dynamics_optimizer(
            cfg["learning_rate_dynamics"], self.ld,
            train_base=train_base_params,
            base_lr=cfg.get("learning_rate_base"),
        )
        self.dyn_opt_state = self.dyn_optimizer.init(self.ld)

        fit_step = build_dynamics_fit_step(
            quad_learnt_step, quad_step, self.dyn_optimizer, inner.dt,
            l2_lambda=cfg.get("l2_lambda", 0.0),
        )
        horizon, action_dim = inner.horizon, inner.action_dim

        def fit_epoch(ld, opt, evalp, net, states, refs, idx):
            # actions from the current controller on the buffer rows
            # (train_base.py:163-168)
            in_s, _, in_r, _ = quad_prepare_data(states, refs)
            logits = control_net_apply(net, in_s, in_r[:, :horizon])
            acts = jax.nn.sigmoid(logits).reshape(
                -1, horizon, action_dim
            )[:, 0]

            def body(carry, i):
                ld_, opt_ = carry
                ld_, opt_, loss = fit_step(
                    ld_, opt_, evalp, states[i], acts[i]
                )
                return (ld_, opt_), loss

            (ld, opt), losses = jax.lax.scan(body, (ld, opt), idx)
            return ld, opt, jnp.mean(losses)

        self._fit_epoch = jax.jit(fit_epoch)

        ctrl_step = build_concurrent_step(
            quad_learnt_step, inner.optimizer, inner.dt, horizon, action_dim
        )
        from apg_trajectory_tracking_tpu.training.common import epoch_scan

        self._ctrl_epoch_learnt = jax.jit(
            lambda p, o, ld, states, refs, idx: epoch_scan(
                lambda p_, o_, s_, r_: ctrl_step(p_, o_, ld, s_, r_),
                p, o, idx, states, refs,
            )
        )

        # best-by-criterion selection in the LEARNT env (the reference's
        # save_model inside evaluate_model under sample_in='train_env');
        # score = (-stable_ratio, divergence) on the fixed selection draw
        self.best_err = (float("inf"), float("inf"))
        self.best_net = inner.net
        self._sel_refs = None

    def run_dynamics_epoch(self):
        inner = self.inner
        inner.key, k = jax.random.split(inner.key)
        idx = shuffled_batches(
            k, len(inner.buffers.states), inner.batch_size
        )
        self.ld, self.dyn_opt_state, loss = self._fit_epoch(
            self.ld, self.dyn_opt_state, inner.eval_dyn, inner.net,
            inner.buffers.states, inner.buffers.refs, idx,
        )
        loss = float(loss)
        inner.logger.log("loss_dyn", loss)
        return loss

    def run_controller_epoch_learnt(self):
        inner = self.inner
        inner.key, k = jax.random.split(inner.key)
        idx = shuffled_batches(
            k, len(inner.buffers.states), inner.batch_size
        )
        inner.net, inner.opt_state, loss = self._ctrl_epoch_learnt(
            inner.net, inner.opt_state, self.ld,
            inner.buffers.states, inner.buffers.refs, idx,
        )
        loss = float(loss)
        inner.logger.log("loss", loss)
        return loss

    def evaluate(self, epoch, nr_test=5):
        """Rollouts in the LEARNT env (sample_in='train_env',
        train_drone.py:40-49): self-play states come from the model the
        controller trains against."""
        from apg_trajectory_tracking_tpu.evaluation.quad_eval import run_eval

        inner = self.inner
        refs, ref_len = inner._eval_references(nr_test)
        metrics, roll = run_eval(
            inner.net, self.ld, refs, ref_len,
            thresh_div=inner.thresh_div,
            thresh_stable=inner.thresh_stable,
            horizon=inner.horizon, dt=inner.dt,
            dyn_step=quad_learnt_step,
        )
        inner._self_play_insert(roll)
        inner.logger.log_dict(metrics)
        return metrics

    def evaluate_mismatched(self, nr_test=5):
        """True-env check: rollouts in the mismatched dynamics."""
        from apg_trajectory_tracking_tpu.evaluation.quad_eval import run_eval

        inner = self.inner
        refs, ref_len = inner._eval_references(nr_test)
        metrics, _ = run_eval(
            inner.net, inner.eval_dyn, refs, ref_len,
            thresh_div=inner.thresh_div,
            thresh_stable=inner.thresh_stable,
            horizon=inner.horizon, dt=inner.dt,
        )
        return metrics

    def evaluate_selection(self, nr_test=10):
        """Model-selection eval: a FIXED test-bank reference draw, flown in
        the LEARNT env under the published protocol semantics (thresh_div
        1.0, test-time break). Selection must not touch the true plant
        (that is the sampling fine-tune leg's privilege); with an accurate
        f_hat this is a faithful proxy of the protocol metric, and a fixed
        draw removes reference-sampling noise from the argmax."""
        from apg_trajectory_tracking_tpu.evaluation.quad_eval import run_eval

        inner = self.inner
        if getattr(self, "_sel_refs", None) is None:
            self._sel_refs = inner._eval_references(nr_test, test_time=True)
        refs, ref_len = self._sel_refs
        metrics, _ = run_eval(
            inner.net, self.ld, refs, ref_len,
            thresh_div=1.0, thresh_stable=1.0,
            horizon=inner.horizon, dt=inner.dt, test_time=True,
            dyn_step=quad_learnt_step,
        )
        return metrics

    def _maybe_select(self):
        sel = self.evaluate_selection()
        score = (-sel["ratio_stable"], sel["mean_divergence"])
        if score < self.best_err:
            self.best_err = score
            self.best_net = self.inner.net
        return sel

    def run_dynamics(self, nr_epochs=10, train_dyn_for_epochs=2,
                     train_dyn_every=1, verbose=True):
        """Alternation schedule (train_base.py:334-375)."""
        for epoch in range(nr_epochs):
            res = self.evaluate(epoch)
            if epoch > train_dyn_for_epochs:
                self._maybe_select()
            if (
                epoch <= train_dyn_for_epochs
                and epoch % train_dyn_every == 0
            ):
                loss = self.run_dynamics_epoch()
                what = "dynamics"
            else:
                loss = self.run_controller_epoch_learnt()
                what = "controller"
            if verbose:
                print(
                    f"Epoch {epoch} [{what}]: loss {loss:.3f} "
                    f"div {res['mean_divergence']:.3f}"
                )
        # final selection pass so the last controller epoch can still win
        self._maybe_select()
        self.inner.finalize()
        return self

    def dynamics_gap(self, n=256):
        """(adapted error, analytic error) one-step vs the mismatched env."""
        inner = self.inner
        inner.key, k1, k2 = jax.random.split(inner.key, 3)
        states = jax.random.normal(k1, (n, 12)) * 0.3
        actions = jax.random.uniform(k2, (n, 4))
        target = quad_step(inner.eval_dyn, states, actions, inner.dt)
        adapted = quad_learnt_step(self.ld, states, actions, inner.dt)
        analytic = quad_step(inner.train_dyn, states, actions, inner.dt)
        return (
            float(jnp.mean(jnp.abs(adapted - target))),
            float(jnp.mean(jnp.abs(analytic - target))),
        )


# ---------------------------------------------------------------------------
# wing adaptation (train_fixed_wing.py:216-237)
# ---------------------------------------------------------------------------

from apg_trajectory_tracking_tpu.dynamics.fixed_wing import (  # noqa: E402
    wing_step,
)
from apg_trajectory_tracking_tpu.dynamics.learnt import (  # noqa: E402
    make_learnt_wing,
)


def wing_learnt_step(ld, states, actions, dt):
    return _generic_learnt_step(wing_step, ld, states, actions, dt)


class TrainWingAdapt:
    """Wing dynamics-adaptation experiment (train_fixed_wing.py:216-237):
    fit a learnt wing model (trainable aero coefficients + residual MLP,
    fixed_wing_dynamics.py:270-326) to a mismatched plant on one-step
    transitions driven by the current controller, then keep training the
    controller against the adapted model. Eval rollouts + self-play run in
    the LEARNT env (the reference's ``sample_in='train_env'``,
    train_fixed_wing.py:224); ``evaluate_mismatched`` checks the true
    plant. The reference raises the divergence thresholds for this
    experiment so the tracking error is reliable
    (train_fixed_wing.py:226-227) — mirrored by the config defaults here.
    """

    def __init__(
        self,
        config=None,
        modified_params=None,
        base_model=None,
        train_base_params=False,
        seed=0,
        save_name="adapt_wing",
        mesh=None,
    ):
        from apg_trajectory_tracking_tpu.data.dataset import (
            wing_prepare_data,
        )
        from apg_trajectory_tracking_tpu.models import control_net_apply
        from apg_trajectory_tracking_tpu.parallel.mesh import (
            make_sharded_epoch,
            replicate,
        )
        from apg_trajectory_tracking_tpu.training.train_wing import (
            TrainWing,
            build_wing_step,
        )

        cfg = dict(load_config("wing") if config is None else config)
        # thresh_div_start=20 / thresh_stable_start=1.5
        # (train_fixed_wing.py:226-227)
        cfg.setdefault("thresh_div_start", 20)
        cfg["thresh_div_start"] = max(cfg["thresh_div_start"], 20)
        cfg["thresh_stable_start"] = max(cfg["thresh_stable_start"], 1.5)
        modified_params = modified_params or {"CL_alpha": 3.0, "CD0": 0.15}
        self.inner = inner = TrainWing(
            cfg, seed=seed, save_name=save_name,
            eval_modified_params=modified_params, base_model=base_model,
            mesh=mesh,
        )
        cfg = inner.config
        # a base_model restore re-loads its own curriculum thresholds;
        # re-raise them for the adapt experiment (train_fixed_wing.py:226)
        inner.thresh_div = max(inner.thresh_div, 20.0)
        inner.thresh_stable = max(inner.thresh_stable, 1.5)

        inner.key, k_ld = jax.random.split(inner.key)
        self.ld, _ = make_learnt_wing(k_ld, std=1e-4)
        self.dyn_optimizer = masked_dynamics_optimizer(
            cfg["learning_rate_dynamics"], self.ld,
            train_base=train_base_params,
            base_lr=cfg.get("learning_rate_base"),
        )
        self.dyn_opt_state = self.dyn_optimizer.init(self.ld)

        fit_step = build_dynamics_fit_step(
            wing_learnt_step, wing_step, self.dyn_optimizer, inner.dt,
            l2_lambda=cfg.get("l2_lambda", 0.0),
        )
        horizon = inner.horizon
        mean, std = inner.mean, inner.std
        dt = inner.dt

        def fit_epoch(ld, opt, evalp, net, states, refs, idx):
            # actions from the current controller on the buffer rows
            # (train_base.py:163-168)
            normed, _, rel_ref, _ = wing_prepare_data(
                states, refs, mean, std, dt=dt, horizon=horizon
            )
            logits = control_net_apply(net, normed, rel_ref)
            acts = jax.nn.sigmoid(logits).reshape(-1, horizon, 4)[:, 0]

            def body(carry, i):
                ld_, opt_ = carry
                ld_, opt_, loss = fit_step(
                    ld_, opt_, evalp, states[i], acts[i]
                )
                return (ld_, opt_), loss

            (ld, opt), losses = jax.lax.scan(body, (ld, opt), idx)
            return ld, opt, jnp.mean(losses)

        self._fit_epoch = jax.jit(fit_epoch)

        # controller epoch against the learnt dynamics, on the trainer's
        # mesh (the ld pytree rides the replicated dyn slot)
        ctrl_step = build_wing_step(
            wing_learnt_step, inner.optimizer, inner.dt_train, dt, horizon,
            mean, std,
        )
        self.ld = replicate(inner.mesh, self.ld)
        self.dyn_opt_state = replicate(inner.mesh, self.dyn_opt_state)
        self._ctrl_epoch_learnt = make_sharded_epoch(inner.mesh, ctrl_step)

        # best-by-criterion selection in the LEARNT env (the reference's
        # save_model call inside evaluate_model, which under
        # sample_in='train_env' also scores in the learnt env)
        self.best_err = float("inf")
        self.best_net = inner.net

    def run_dynamics_epoch(self):
        inner = self.inner
        inner.key, k = jax.random.split(inner.key)
        idx = shuffled_batches(
            k, len(inner.buffers.states), inner.batch_size
        )
        self.ld, self.dyn_opt_state, loss = self._fit_epoch(
            self.ld, self.dyn_opt_state, inner.eval_dyn, inner.net,
            inner.buffers.states, inner.buffers.refs, idx,
        )
        loss = float(loss)
        inner.logger.log("loss_dyn", loss)
        return loss

    def run_controller_epoch_learnt(self):
        inner = self.inner
        inner.key, k = jax.random.split(inner.key)
        idx = shuffled_batches(
            k, len(inner.buffers.states), inner.batch_size
        )
        inner.net, inner.opt_state, loss = self._ctrl_epoch_learnt(
            inner.net, inner.opt_state, self.ld,
            inner.buffers.states, inner.buffers.refs, idx,
        )
        loss = float(loss)
        inner.logger.log("loss", loss)
        return loss

    def evaluate(self, epoch, nr_test=10):
        """Rollouts in the LEARNT env (sample_in='train_env'); self-play
        states come from the model the controller trains against."""
        from apg_trajectory_tracking_tpu.evaluation.wing_eval import run_eval

        inner = self.inner
        inner.key, k = jax.random.split(inner.key)
        metrics, roll, targets = run_eval(
            inner.net, self.ld, k, inner.mean, inner.std,
            nr_test=nr_test, thresh_div=inner.thresh_div,
            thresh_stable=inner.thresh_stable, horizon=inner.horizon,
            dt=inner.dt, dyn_step=wing_learnt_step, mesh=inner.mesh,
        )
        inner._self_play_insert(roll, targets)
        inner.logger.log_dict(metrics)
        return metrics

    def evaluate_mismatched(self, nr_test=5, test_time=True):
        """True-plant check: fly to waypoints in the mismatched dynamics."""
        from apg_trajectory_tracking_tpu.evaluation.wing_eval import run_eval

        inner = self.inner
        inner.key, k = jax.random.split(inner.key)
        metrics, _, _ = run_eval(
            inner.net, inner.eval_dyn, k, inner.mean, inner.std,
            nr_test=nr_test, thresh_div=inner.thresh_div,
            thresh_stable=inner.thresh_stable, horizon=inner.horizon,
            dt=inner.dt, test_time=test_time, mesh=inner.mesh,
        )
        return metrics

    def run_dynamics(self, nr_epochs=None, train_dyn_for_epochs=None,
                     train_dyn_every=1, verbose=True):
        """Alternation schedule (train_base.py:334-375)."""
        cfg = self.inner.config
        if nr_epochs is None:
            nr_epochs = cfg["nr_epochs"]
        train_dyn_for_epochs = (
            train_dyn_for_epochs
            if train_dyn_for_epochs is not None
            else cfg.get("train_dyn_for_epochs", 5)
        )
        for epoch in range(nr_epochs):
            res = self.evaluate(epoch)
            # score the controller once the dynamics fit has converged —
            # earlier evals run against a still-moving learnt model
            if epoch > train_dyn_for_epochs and (
                res["mean_success"] < self.best_err
            ):
                self.best_err = res["mean_success"]
                self.best_net = self.inner.net
            if (
                epoch <= train_dyn_for_epochs
                and epoch % train_dyn_every == 0
            ):
                loss = self.run_dynamics_epoch()
                what = "dynamics"
            else:
                loss = self.run_controller_epoch_learnt()
                what = "controller"
            if verbose:
                print(
                    f"Epoch {epoch} [{what}]: loss {loss:.3f} "
                    f"err {res['mean_success']:.3f}"
                )
        # final eval so the last controller epoch can still win selection
        res = self.evaluate(nr_epochs)
        if res["mean_success"] < self.best_err:
            self.best_err = res["mean_success"]
            self.best_net = self.inner.net
        self.inner.finalize()
        return self

    def dynamics_gap(self, n=256, key=None):
        """(adapted error, analytic error) one-step vs the mismatched
        plant, on a cruise-flight state distribution."""
        inner = self.inner
        if key is None:
            inner.key, key = jax.random.split(inner.key)
        k1, k2 = jax.random.split(key)
        base = jnp.zeros((n, 12), dtype=jnp.float32).at[:, 3].set(11.5)
        scale = jnp.asarray(
            [5.0, 2.0, 2.0, 1.5, 0.5, 0.5, 0.2, 0.2, 0.2, 0.3, 0.3, 0.3],
            dtype=jnp.float32,
        )
        states = base + jax.random.normal(k1, (n, 12)) * scale
        actions = jax.random.uniform(k2, (n, 4))
        target = wing_step(inner.eval_dyn, states, actions, inner.dt)
        adapted = wing_learnt_step(self.ld, states, actions, inner.dt)
        analytic = wing_step(inner.train_dyn, states, actions, inner.dt)
        return (
            float(jnp.mean(jnp.abs(adapted - target))),
            float(jnp.mean(jnp.abs(analytic - target))),
        )
