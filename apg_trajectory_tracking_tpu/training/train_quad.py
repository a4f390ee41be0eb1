"""Quadrotor APG training: concurrent, autoregressive, and LSTM modes.

Re-designs ``scripts/train_drone.py`` + the shared loop of
``scripts/train_base.py``:

  * data: (state, 10x9 reference window) pairs sliced from the GP trajectory
    bank (drone_env.py:232-269) held in device buffers with a self-play ring
    segment written from eval rollouts;
  * concurrent mode (train_drone.py:175-203): the net emits all k actions at
    once; the dynamics unroll is a ``lax.scan``; BPTT = reverse-mode scan;
  * autoregressive/LSTM modes (train_drone.py:113-173): per-step re-
    featurization with a sliding reference window inside the scan; the LSTM
    threads an explicit (h, c) carry;
  * curricula: thresh_div +0.05 every 5 epochs (train_drone.py:221-226);
    speed_factor 0.2 -> +0.1 -> 0.4 with threshold reset
    (train_base.py:289-332);
  * a full epoch is one jitted scan over minibatches.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from apg_trajectory_tracking_tpu.data.dataset import (
    make_quad_buffers,
    insert_self_play,
    replace_sampled,
    quad_prepare_data,
    quad_state_features,
)
from apg_trajectory_tracking_tpu.dynamics.quad import (
    quad_params,
    quad_step,
    quad_step_fast,
)
from apg_trajectory_tracking_tpu.envs.quad_env import full_state_training_data
from apg_trajectory_tracking_tpu.evaluation.quad_eval import run_eval
from apg_trajectory_tracking_tpu.losses import quad_mpc_loss
from apg_trajectory_tracking_tpu.models import (
    init_control_net,
    control_net_apply,
    init_lstm_net,
    lstm_net_apply,
    init_lstm_state,
)
from apg_trajectory_tracking_tpu.parallel.mesh import (
    auto_mesh,
    host_local_rng,
    make_sharded_epoch,
    replicate,
    shard_batch,
)
from apg_trajectory_tracking_tpu.trajectory.generate import (
    ensure_trajectory_bank,
    load_trajectory_bank,
    prepare_trajectory,
)
from apg_trajectory_tracking_tpu.training.common import (
    load_config,
    sgd_momentum,
    shuffled_batches,
)
from apg_trajectory_tracking_tpu.utils.logging import ResultsLogger

IN_STATE_SIZE = 15  # quad feature vector (dataset.py:185-190)


def build_concurrent_step(dyn_step, optimizer, dt, horizon, action_dim=4,
                          remat=False):
    """Concurrent-mode SGD step (train_drone.py:175-203).

    ``remat=True`` rematerializes each dynamics step in the backward pass
    (``jax.checkpoint``) instead of storing all intermediate states — the
    long-horizon memory knob (SURVEY.md 5.7): BPTT memory drops from
    O(horizon) to O(1) activations at the cost of recomputing the (cheap)
    forward dynamics. Pointless at k=10; matters at k in the thousands.
    """

    def loss_fn(net_params, dyn_params, states, refs):
        in_state, current_state, in_ref, rel_ref = quad_prepare_data(
            states, refs
        )
        logits = control_net_apply(net_params, in_state, in_ref)
        action_seq = jax.nn.sigmoid(logits).reshape(-1, horizon, action_dim)

        def body(state, act):
            nxt = dyn_step(dyn_params, state, act, dt)
            return nxt, nxt

        if remat:
            body = jax.checkpoint(body)

        # full unroll: the 10-step body is tiny elementwise math, and
        # unrolling removes the scan's per-iteration overhead (+11%
        # train-step throughput measured on v5e at 4096 envs); rematted
        # long horizons keep the sequential scan
        _, inter = jax.lax.scan(
            body, current_state, jnp.swapaxes(action_seq, 0, 1),
            unroll=not remat,
        )
        inter = jnp.swapaxes(inter, 0, 1)
        return quad_mpc_loss(inter, rel_ref, action_seq)

    def step(net_params, opt_state, dyn_params, states, refs):
        loss, grads = jax.value_and_grad(loss_fn)(
            net_params, dyn_params, states, refs
        )
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(net_params, updates), opt_state, loss

    return step


def build_recurrent_step(
    dyn_step, optimizer, dt, horizon, action_dim=4, lstm=False,
    lstm_hidden=8,
):
    """Autoregressive / LSTM-mode SGD step (train_drone.py:113-173).

    The reference window here is 2*horizon long (train_base.py:119-121); at
    inner step k the net sees window[k:k+horizon] with positions re-centered
    on the current drone position, and the state features are recomputed.

    ``lstm_hidden=8`` matches the reference's LSTM_NEW cell; wider cells
    (config key ``hidden``) are a beyond-reference capacity option.
    """

    def loss_fn(net_params, dyn_params, states, refs2h):
        batch = states.shape[0]
        carry0 = init_lstm_state(batch, hidden=lstm_hidden) if lstm else None

        # drone-centric frame: refs relative to the start position, start
        # position zeroed (QuadDataset.prepare_data, dataset.py:169-175)
        rel_refs = refs2h.at[:, :, :3].add(-states[:, None, :3])
        state0 = states.at[:, :3].set(0.0)

        def body(carry, k):
            state, lstm_state = carry
            window = jax.lax.dynamic_slice_in_dim(rel_refs, k, horizon, axis=1)
            # re-center on the current position each inner step
            # (train_drone.py:138-142; the reference mutates its window
            # in place across overlapping slices — an upstream slice-view
            # bug; we apply the intended single subtraction)
            rel = window.at[:, :, :3].add(-state[:, None, :3])
            in_state = quad_state_features(state)
            vel_minus = rel[:, :, 6:9] - state[:, None, 6:9]
            in_ref = jnp.concatenate(
                [rel[:, :, :3], rel[:, :, 6:9], vel_minus], axis=2
            )
            if lstm:
                lstm_state, logits = lstm_net_apply(
                    net_params, lstm_state, in_state, in_ref
                )
            else:
                logits = control_net_apply(net_params, in_state, in_ref)
            action = jax.nn.sigmoid(logits)
            new_state = dyn_step(dyn_params, state, action, dt)
            return (new_state, lstm_state), (new_state, action)

        (_, _), (inter, actions) = jax.lax.scan(
            body, (state0, carry0), jnp.arange(horizon)
        )
        inter = jnp.swapaxes(inter, 0, 1)
        actions = jnp.swapaxes(actions, 0, 1)
        # loss against the first horizon of the (relative) window
        # (train_drone.py:159-165)
        return quad_mpc_loss(inter, rel_refs[:, :horizon], actions)

    def step(net_params, opt_state, dyn_params, states, refs):
        loss, grads = jax.value_and_grad(loss_fn)(
            net_params, dyn_params, states, refs
        )
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(net_params, updates), opt_state, loss

    return step


class TrainQuad:
    """Host-side orchestration of quad APG training."""

    def __init__(
        self,
        config=None,
        train_mode=None,
        seed=0,
        save_name="test",
        data_dir="data/traj_data",
        modified_params=None,
        eval_modified_params=None,
        curriculum=True,
        base_model=None,
        tensorboard=False,
        minjerk_mix=0.0,
        mesh=None,
        # training unrolls use the pre-combined throughput step (promoted
        # after the within-session A/B in scripts/perf_ab.py — DESIGN.md
        # §2; parity vs quad_step pinned incl. gradients in
        # tests/test_dynamics.py). Evaluation keeps quad_step, the
        # reference-exact op order.
        dyn_step=quad_step_fast,
    ):
        self.config = cfg = dict(config or load_config("quad"))
        if train_mode is not None:
            cfg["train_mode"] = train_mode
        self.mode = cfg.get("train_mode", "concurrent")
        if self.mode not in ("concurrent", "autoregressive", "LSTM"):
            raise ValueError(
                "train_mode must be concurrent, autoregressive, or LSTM"
            )
        self.dt = cfg["delta_t"]
        self.horizon = cfg["horizon"]
        self.batch_size = cfg["batch_size"]
        self.action_dim = cfg["action_dim"]
        # concurrent: ref window = horizon; recurrent: 2*horizon
        # (train_base.py:119-128)
        self.ref_length = (
            self.horizon if self.mode == "concurrent" else 2 * self.horizon
        )
        self.curriculum = curriculum
        self.thresh_div = cfg["thresh_div_start"]
        self.thresh_stable = cfg["thresh_stable_start"]
        self.speed_factor = 0.2 if curriculum else cfg["speed_factor"]
        self.data_speed_factor = cfg["speed_factor"]

        mp = modified_params or cfg.get("modified_params", {})
        self.train_dyn = quad_params(mp)
        # eval_modified_params != None is the sampling-based fine-tune
        # experiment (train_drone.py:281-299): eval/self-play rollouts run in
        # a mismatched env while training BPTT uses the analytic model
        self.eval_dyn = quad_params(
            eval_modified_params if eval_modified_params is not None else mp
        )

        # trajectory bank (generated on first use)
        self.bank = load_trajectory_bank(ensure_trajectory_bank(data_dir))
        self.test_bank = load_trajectory_bank(data_dir, test=True)

        # per-host RNG fold: on multi-host meshes each process samples a
        # disjoint, deterministic data shard (parallel/mesh.py)
        self.rng = host_local_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.key, k_net = jax.random.split(self.key)

        out_dim = (
            self.action_dim * self.horizon
            if self.mode == "concurrent"
            else self.action_dim
        )
        # a resumed run must build the base checkpoint's architecture: the
        # npz loader replaces template leaves without shape checks, so a
        # width mismatch would load anyway and crash far away inside jit
        if base_model is not None:
            base_cfg_path = os.path.join(base_model, "config.json")
            if os.path.isfile(base_cfg_path):
                import json as _json

                with open(base_cfg_path) as f:
                    base_hidden = _json.load(f).get("hidden")
                if base_hidden is not None:
                    if cfg.get("hidden", base_hidden) != base_hidden:
                        raise ValueError(
                            f"--base_model was trained with hidden="
                            f"{base_hidden} but this config asks for "
                            f"hidden={cfg['hidden']}; drop the override "
                            f"or match the base width"
                        )
                    cfg["hidden"] = base_hidden
        if self.mode == "LSTM":
            # cell width: reference default 8; config "hidden" widens it
            # (the eval/export loaders already read cfg["hidden"])
            self.lstm_hidden = cfg.get("hidden", 8)
            self.net = init_lstm_net(
                k_net, IN_STATE_SIZE, self.horizon, cfg["ref_dim"],
                out_dim, conv=True, hidden=self.lstm_hidden,
            )
        else:
            self.net = init_control_net(
                k_net, IN_STATE_SIZE, self.horizon, cfg["ref_dim"],
                out_dim, conv=True, hidden=cfg.get("hidden", 64),
            )
        self.optimizer = sgd_momentum(cfg["learning_rate_controller"])
        self.opt_state = self.optimizer.init(self.net)

        # resume / fine-tune from a previous run (the reference's
        # base_model path, train_drone.py:53-68): params, optimizer
        # momentum, and curriculum scalars are restored
        if base_model is not None:
            from apg_trajectory_tracking_tpu.utils.checkpoints import (
                restore_train_state,
                resume_name,
            )

            self.net, self.opt_state, base_cfg = restore_train_state(
                base_model, resume_name(base_model, "model_quad"),
                self.net, self.opt_state,
            )
            self.thresh_div = base_cfg.get("thresh_div", self.thresh_div)
            if curriculum:
                self.speed_factor = base_cfg.get(
                    "speed_factor", self.speed_factor
                )

        # buffers: epoch_size sampled + self_play*epoch_size ring slots
        num_sampled = cfg["epoch_size"]
        num_sp = int(cfg["self_play"] * cfg["epoch_size"])
        states, refs = full_state_training_data(
            self.rng, self.bank, num_sampled + num_sp,
            ref_length=self.ref_length, dt=self.dt,
            speed_factor=self.data_speed_factor,
        )
        self.buffers = make_quad_buffers(states, refs, num_sampled)

        # the device mesh IS the execution path (not a demo): params /
        # optimizer momentum / dynamics replicated, data buffers and every
        # minibatch sharded on 'env', gradients psum-reduced by XLA. On a
        # single chip auto_mesh degenerates to a size-1 mesh at zero cost;
        # under init_distributed the same code spans hosts (SURVEY.md 2.9).
        self.mesh = mesh if mesh is not None else auto_mesh(
            self.batch_size, num_sampled + num_sp
        )
        self.net = replicate(self.mesh, self.net)
        self.opt_state = replicate(self.mesh, self.opt_state)
        self.train_dyn = replicate(self.mesh, self.train_dyn)
        self.eval_dyn = replicate(self.mesh, self.eval_dyn)
        self._shard_buffers()

        # custom dyn_step supports e.g. action-space ablations (DESIGN.md
        # speed-0.5 analysis) and learnt-dynamics variants
        self.dyn_step = dyn_step
        # in-training evaluation (and thus best-checkpoint selection) must
        # run the same reference-exact step as the published evaluators
        # (run_eval's default), not the pre-combined throughput step — a
        # custom/ablation step, by contrast, IS the eval subject
        self.eval_dyn_step = (
            quad_step if dyn_step is quad_step_fast else dyn_step
        )
        if self.mode == "concurrent":
            step = build_concurrent_step(
                dyn_step, self.optimizer, self.dt, self.horizon,
                self.action_dim,
            )
        else:
            step = build_recurrent_step(
                dyn_step, self.optimizer, self.dt, self.horizon,
                self.action_dim, lstm=(self.mode == "LSTM"),
                lstm_hidden=getattr(self, "lstm_hidden", 8),
            )
        self._train_epoch = make_sharded_epoch(
            self.mesh, step, donate=True, unroll=4
        )

        if not 0.0 <= float(minjerk_mix) <= 1.0:
            raise ValueError(
                f"minjerk_mix must be in [0, 1], got {minjerk_mix}"
            )
        self.minjerk_mix = float(minjerk_mix)
        self._apply_minjerk_mix()

        self.save_path = os.path.join("trained_models", "quad", save_name)
        self.logger = ResultsLogger(self.save_path,
                                    tensorboard=tensorboard)
        # best-model criterion: suc_up_down=1 keeps the highest
        # mean_success, -1 the lowest mean_divergence. Deliberate
        # deviation: the reference records suc_up_down in its configs
        # (its shipped quad model has -1) but train_base.py:233-244
        # saves every epoch unconditionally; selecting on the recorded
        # criterion is what the config plainly intends.
        self.suc_up_down = cfg.get("suc_up_down", 1)
        self.best_score = -np.inf if self.suc_up_down == 1 else np.inf
        self.successes = []
        self.first_epoch_with_this_vel = 0

    def _shard_buffers(self):
        """(Re-)pin the data buffers onto the mesh's 'env' axis. Functional
        buffer updates (self-play scatter, resampling) can leave XLA-chosen
        output shardings; this is a cheap reshard/no-op that keeps the
        epoch runner's input contract."""
        states, refs = shard_batch(
            self.mesh, (self.buffers.states, self.buffers.refs)
        )
        self.buffers = self.buffers._replace(states=states, refs=refs)

    # -- eval references ----------------------------------------------------

    def _eval_references(self, nr_test, test_time=False):
        """Prepare nr_test random reference trajectories at the current
        curriculum speed (Random, random_traj.py:29-48: z += 3)."""
        bank = self.test_bank if test_time else self.bank
        idx = self.rng.randint(len(bank), size=nr_test)
        refs = np.stack(
            [
                prepare_trajectory(bank[i], self.dt, self.speed_factor)
                for i in idx
            ]
        )
        refs[:, :, 2] += 3.0
        return jnp.asarray(refs), refs.shape[1] - self.horizon

    # -- epoch pieces ---------------------------------------------------------

    def evaluate(self, epoch, nr_test=10, test_time=False):
        refs, ref_len = self._eval_references(nr_test, test_time)
        eval_kwargs = {}
        if self.mode == "LSTM":
            eval_kwargs["net_apply"] = lstm_net_apply
            eval_kwargs["net_carry"] = init_lstm_state(
                nr_test, hidden=self.lstm_hidden
            )
        if self.ref_length != self.horizon:
            eval_kwargs["window_len"] = self.ref_length
        metrics, roll = run_eval(
            self.net, self.eval_dyn, refs, ref_len,
            thresh_div=self.thresh_div, thresh_stable=self.thresh_stable,
            horizon=self.horizon, dt=self.dt, test_time=test_time,
            mesh=self.mesh, dyn_step=self.eval_dyn_step, **eval_kwargs,
        )
        if not test_time:
            self._self_play_insert(roll)
        self.logger.log_dict(metrics)
        self.logger.log("thresh_div", self.thresh_div)

        # thresh_div curriculum (train_drone.py:221-226)
        if epoch % 5 == 0 and self.thresh_div < self.config["thresh_div_end"]:
            self.thresh_div += 0.05

        if self.suc_up_down == 1:
            score, improved = (
                metrics["mean_success"],
                metrics["mean_success"] > self.best_score,
            )
        else:
            score, improved = (
                metrics["mean_divergence"],
                metrics["mean_divergence"] < self.best_score,
            )
        if epoch > 0 and improved:
            self.best_score = score
            # epoch-suffixed snapshot on improvement (train_base.py:233-244)
            self._save(epoch=epoch)
            self._save()
        return metrics

    def _self_play_insert(self, roll):
        """Insert every take_every_x-th visited (state, window) pair into
        the self-play ring (network_wrapper.py:42-52)."""
        take = self.config.get("self_play_every_x", 2)
        if self.buffers.num_self_play == 0:
            return
        states = roll["states"].reshape(-1, 12)[::take]
        wl = roll["windows"].shape[-2]
        windows = roll["windows"].reshape(-1, wl, 9)[::take]
        self.buffers = insert_self_play(self.buffers, states, windows)
        self._shard_buffers()

    def _resample(self, epoch):
        """Resample the non-self-play segment every resample_every epochs
        (train_base.py:220-231)."""
        if (epoch + 1) % self.config["resample_every"] == 0:
            states, refs = full_state_training_data(
                self.rng, self.bank, self.buffers.num_sampled,
                ref_length=self.ref_length, dt=self.dt,
                speed_factor=self.data_speed_factor,
            )
            self.buffers = replace_sampled(
                self.buffers, jnp.asarray(states), jnp.asarray(refs)
            )
            self._apply_minjerk_mix()
            if self.minjerk_mix <= 0:
                self._shard_buffers()

    def _apply_minjerk_mix(self):
        """Replace a fraction of replay windows with closed-form min-jerk
        receding-horizon windows toward the window's own end point.

        Beyond-reference robustness option: the analytic Hover/Straight/
        Circle references feed the net min-jerk windows at test time
        (trajectory/refs.py), a distribution the replay bank never covers;
        mixing them into training fixes the (position-window shape)
        part of that shift — measured: straight-line err 0.036 -> 0.008
        at ~6 points of replay stability; the shipped
        assets/quad_minjerk_trained used minjerk_mix=0.5.

        Layout note: both these training windows and the test-time
        analytic windows use the loss-consistent [pos, 0, vel] row
        layout (trajectory/refs.py _to_state_rows remaps the raw
        min-jerk [pos, vel, acc] rows; the reference's own
        get_ref_traj feeds acc where prepare_data reads vel,
        plan_trajectory.py:701-734 vs dataset.py:191-204 — an upstream
        bug deliberately not reproduced).

        Only the sampled segment [0:num_sampled] is mixed: the self-play
        ring is continuously overwritten by eval rollouts, so mixing it
        would silently dilute between resamples."""
        if self.minjerk_mix <= 0:
            return
        from apg_trajectory_tracking_tpu.trajectory.minjerk import (
            min_jerk_reference,
        )
        from apg_trajectory_tracking_tpu.trajectory.refs import (
            _to_state_rows,
        )

        n = self.buffers.num_sampled
        idx = self.rng.choice(
            n, int(self.minjerk_mix * n), replace=False
        )
        states = self.buffers.states[idx]
        old_win = self.buffers.refs[idx]
        win = jax.vmap(
            lambda p, v, gp, gv: _to_state_rows(min_jerk_reference(
                p, v, jnp.zeros(3), gp, gv, self.dt, self.ref_length
            ))
        )(
            states[:, :3], states[:, 6:9],
            old_win[:, -1, :3], old_win[:, -1, 6:9],
        )
        self.buffers = self.buffers._replace(
            refs=self.buffers.refs.at[jnp.asarray(idx)].set(win)
        )
        self._shard_buffers()

    def _speed_curriculum(self, epoch):
        """Speed curriculum (train_base.py:289-332)."""
        if not self.curriculum:
            return
        current_possible = 1000 / (self.speed_factor / self.dt)
        self.successes.append(self.logger.results["mean_success"][-1])
        advance = (
            len(self.successes) > 5
            and np.all(np.array(self.successes[-5:]) > current_possible)
        ) or (epoch - self.first_epoch_with_this_vel > 100)
        if advance and self.speed_factor < 0.4:
            self.speed_factor = round(self.speed_factor + 0.1, 3)
            self.thresh_div = 0.1
            self.successes = []
            self.first_epoch_with_this_vel = epoch + 1
            self.best_score = -np.inf if self.suc_up_down == 1 else np.inf
            print(f" ---- increase speed to {self.speed_factor} ---- ")

    def run_epoch(self):
        import time

        self.key, k = jax.random.split(self.key)
        idx = shuffled_batches(
            k, len(self.buffers.states), self.batch_size
        )
        t0 = time.perf_counter()
        self.net, self.opt_state, loss = self._train_epoch(
            self.net, self.opt_state, self.train_dyn,
            self.buffers.states, self.buffers.refs, idx,
        )
        loss = float(loss)  # blocks; epoch time includes device work
        dt_epoch = time.perf_counter() - t0
        self.logger.log("loss", loss)
        self.logger.log("epoch_time_s", dt_epoch)
        self.logger.log(
            "env_steps_per_s",
            idx.size * self.horizon / max(dt_epoch, 1e-9),
        )
        return loss

    def fit(self, nr_epochs=None, nr_test=10, verbose=True):
        nr_epochs = nr_epochs or self.config["nr_epochs"]
        for epoch in range(nr_epochs):
            metrics = self.evaluate(epoch, nr_test=nr_test)
            self._speed_curriculum(epoch)
            self._resample(epoch)
            loss = self.run_epoch()
            if verbose:
                print(
                    f"Epoch {epoch}: loss {loss:.1f} "
                    f"success {metrics['mean_success']:.1f} "
                    f"div {metrics['mean_divergence']:.3f} "
                    f"speed {self.speed_factor} thresh {self.thresh_div:.2f}"
                )
        self.finalize()
        return self

    def _save(self, epoch=None, suffix=""):
        from apg_trajectory_tracking_tpu.utils.checkpoints import (
            save_train_state,
        )

        name = "model_quad" + (str(epoch) if epoch is not None else suffix)
        save_train_state(
            self.save_path, name, self.net, self.opt_state,
            {
                **self.config,
                "thresh_div": self.thresh_div,
                "speed_factor": self.speed_factor,
                "mean": np.asarray(self.buffers.mean).tolist(),
                "std": np.asarray(self.buffers.std).tolist(),
                "ref_length": self.ref_length,
                "minjerk_mix": self.minjerk_mix,
            },
            backend=self.config.get("checkpoint_backend", "npz"),
        )

    def finalize(self):
        # final-epoch weights go under a distinct name; the unsuffixed
        # model_quad stays the best-by-criterion snapshot saved in
        # evaluate() (the one eval CLIs load by default) — unless no
        # improvement was ever recorded, in which case the final state is
        # the only checkpoint
        self._save(suffix="_final")
        from apg_trajectory_tracking_tpu.utils.checkpoints import (
            checkpoint_exists,
        )

        if not checkpoint_exists(self.save_path, "model_quad"):
            self._save()
        self.logger.finalize()
