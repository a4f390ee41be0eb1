"""End-user CLI smoke tests: the eval scripts run against shipped assets
exactly as a reference user would invoke them (monkeypatched argv; CPU
backend is already forced by conftest)."""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def _run(module, argv, monkeypatch, capsys, cwd=REPO):
    import importlib

    mod = importlib.import_module(module)
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.chdir(cwd)
    mod.main()
    return capsys.readouterr().out


@pytest.mark.parametrize(
    "asset", ["assets/quad_trained", "assets/quad_trained_9k",
              "assets/quad_ar_trained_9k", "assets/quad_lstm_trained_9k",
              "assets/quad_mpc_distilled_h14"]
)
def test_evaluate_quad_rand(monkeypatch, capsys, asset):
    out = _run(
        "evaluate_quad",
        ["evaluate_quad.py", "-m", asset, "-a", "4"],
        monkeypatch, capsys,
    )
    metrics = json.loads(out[out.rindex("{"):])
    assert 0 < metrics["mean_divergence"] < 1.0
    assert 0.0 <= metrics["ratio_stable"] <= 1.0


def test_evaluate_quad_analytic_circle(monkeypatch, capsys):
    out = _run(
        "evaluate_quad",
        ["evaluate_quad.py", "-m", "assets/quad_minjerk_trained", "-a", "2",
         "-r", "circle"],
        monkeypatch, capsys,
    )
    assert "circle: avg divergence" in out


def test_evaluate_quad_animate(monkeypatch, capsys, tmp_path):
    # with >1 rollouts each renders against its own reference, one file
    # per rollout (flight_0.gif, flight_1.gif)
    gif = str(tmp_path / "flight.gif")
    out = _run(
        "evaluate_quad",
        ["evaluate_quad.py", "-m", "assets/quad_trained", "-a", "2",
         "--animate", gif, "--live", "5"],
        monkeypatch, capsys,
    )
    for i in range(2):
        assert os.path.getsize(str(tmp_path / f"flight_{i}.gif")) > 1000
    assert "animation saved" in out
    # --live N replays the first rollout offscreen under Agg, capped
    assert "live replay: 5 frames" in out


def test_evaluate_quad_analytic_wide_window(monkeypatch, capsys):
    """Wide-window students (net_window != horizon) must run on the
    analytic-reference path too: windows are generated at net_window
    rows and the LSTM carry at the checkpoint's cell width (regression —
    both previously crashed with dot_general shape errors)."""
    out = _run(
        "evaluate_quad",
        ["evaluate_quad.py", "-m", "assets/quad_mpc_distilled_s05",
         "-a", "2", "-r", "circle"],
        monkeypatch, capsys,
    )
    assert "circle: avg divergence" in out
    out = _run(
        "evaluate_quad",
        ["evaluate_quad.py", "-m", "assets/quad_mpc_distilled_lstm",
         "-a", "2", "-r", "hover"],
        monkeypatch, capsys,
    )
    assert "hover: avg divergence" in out


def test_evaluate_cartpole(monkeypatch, capsys):
    out = _run(
        "evaluate_cartpole",
        ["evaluate_cartpole.py", "-m", "assets/cartpole_balance_trained",
         "-a", "4", "--live", "8"],
        monkeypatch, capsys,
    )
    metrics = json.loads(out[out.rindex("{"):])
    assert metrics["mean_stable"] > 200
    assert "live replay: 8 frames" in out


def test_evaluate_cartpole_ilqr_swingup(monkeypatch, capsys):
    """'-m ilqr --swingup': the two-start iLQR through the user CLI (the
    solver that closes swing-up, DESIGN.md §4)."""
    out = _run(
        "evaluate_cartpole",
        ["evaluate_cartpole.py", "-m", "ilqr", "--swingup", "-a", "2"],
        monkeypatch, capsys,
    )
    metrics = json.loads(out[out.rindex("{"):])
    assert metrics["success_rate"] == 1.0
    assert metrics["mean_final_angle"] < 0.1


def test_evaluate_wing(monkeypatch, capsys):
    out = _run(
        "evaluate_wing",
        ["evaluate_wing.py", "-m", "assets/wing_trained", "-a", "3",
         "--live", "5"],
        monkeypatch, capsys,
    )
    metrics = json.loads(out[out.rindex("{"):])
    assert metrics["mean_success"] < 1.0  # meters from target
    assert "live replay: 5 frames" in out


@pytest.mark.slow
def test_distill_mpc_smoke(monkeypatch, capsys, tmp_path):
    """Tiny MPC-DAgger distillation end-to-end: label -> clone -> one
    DAgger round -> checkpoint."""
    monkeypatch.chdir(tmp_path)
    os.symlink(os.path.join(REPO, "data"), "data")
    out = _run(
        "distill_mpc",
        ["distill_mpc.py", "--n_pairs", "128", "--steps", "300",
         "--batch", "64", "--dagger_iters", "1", "--dagger_rollouts", "2",
         "--eval", "4", "--data_dir", "data/traj_data", "--mpc_iters",
         "20", "-s", "distill_smoke"],
        monkeypatch, capsys, cwd=tmp_path,
    )
    assert "cloned:" in out and "dagger 0" in out
    assert os.path.exists(
        os.path.join("trained_models", "quad", "distill_smoke",
                     "model_quad.npz")
    )
    # resume leg: --base_model skips cloning and continues the DAgger loop
    out = _run(
        "distill_mpc",
        ["distill_mpc.py", "--n_pairs", "64", "--steps", "100",
         "--batch", "32", "--dagger_iters", "1", "--dagger_rollouts", "2",
         "--eval", "2", "--data_dir", "data/traj_data", "--mpc_iters",
         "10", "--base_model", "distill_smoke", "-s", "distill_smoke2"],
        monkeypatch, capsys, cwd=tmp_path,
    )
    assert "dagger 0" in out
    assert os.path.exists(
        os.path.join("trained_models", "quad", "distill_smoke2",
                     "model_quad.npz")
    )


@pytest.mark.slow
def test_distill_mpc_lstm_smoke(monkeypatch, capsys, tmp_path):
    """Tiny recurrent distillation end-to-end (teacher rollout ->
    teacher forcing -> one DAgger round -> checkpoint), then the saved
    non-default-width student evaluates through the standard eval CLI
    (regression: the LSTM carry/template must honor cfg['hidden'])."""
    monkeypatch.chdir(tmp_path)
    os.symlink(os.path.join(REPO, "data"), "data")
    out = _run(
        "distill_mpc_lstm",
        ["distill_mpc_lstm.py", "--rollouts", "2", "--steps", "40",
         "--seq_batch", "2", "--dagger_iters", "1", "--dagger_rollouts",
         "2", "--eval", "2", "--mpc_iters", "10", "--hidden", "16",
         "--data_dir", "data/traj_data", "-s", "lstm_smoke"],
        monkeypatch, capsys, cwd=tmp_path,
    )
    assert "teacher-forced:" in out and "dagger 0" in out
    assert os.path.exists(
        os.path.join("trained_models", "quad", "lstm_smoke",
                     "model_quad.npz")
    )
    out = _run(
        "evaluate_quad",
        ["evaluate_quad.py", "-m", "lstm_smoke", "-a", "2",
         "--data_dir", "data/traj_data"],
        monkeypatch, capsys, cwd=tmp_path,
    )
    metrics = json.loads(out[out.rindex("{"):])
    assert 0.0 <= metrics["ratio_stable"] <= 1.0


@pytest.mark.slow
def test_distill_mpc_wing_smoke(monkeypatch, capsys, tmp_path):
    monkeypatch.chdir(tmp_path)
    out = _run(
        "distill_mpc_wing",
        ["distill_mpc_wing.py", "--n_pairs", "128", "--steps", "200",
         "--batch", "64", "--dagger_iters", "1", "--dagger_rollouts", "3",
         "--eval", "3", "--mpc_iters", "15", "-s", "wing_distill_smoke"],
        monkeypatch, capsys, cwd=tmp_path,
    )
    assert "cloned:" in out and "dagger 0" in out
    assert os.path.exists(
        os.path.join("trained_models", "wing", "wing_distill_smoke",
                     "model_wing.npz")
    )


def test_evaluate_epochs(monkeypatch, capsys, tmp_path):
    """Train a 3-epoch smoke run (producing epoch snapshots), then sweep
    its checkpoints to csv."""
    from apg_trajectory_tracking_tpu.training.common import load_config
    from apg_trajectory_tracking_tpu.training.train_quad import TrainQuad

    monkeypatch.chdir(tmp_path)
    os.symlink(os.path.join(REPO, "data"), "data")
    cfg = load_config(
        "quad", dict(epoch_size=32, self_play=0.5, nr_epochs=3),
        config_dir=os.path.join(REPO, "configs"),
    )
    TrainQuad(config=cfg, seed=0, save_name="sweeptest").fit(
        3, nr_test=4, verbose=False
    )
    model_dir = os.path.join("trained_models", "quad", "sweeptest")
    out = _run(
        "evaluate_epochs",
        ["evaluate_epochs.py", "-m", model_dir, "-a", "2"],
        monkeypatch, capsys, cwd=tmp_path,
    )
    assert os.path.exists(os.path.join(model_dir, "epoch_sweep.csv")) \
        or "epoch" in out


def test_train_quad_override_flag(monkeypatch, capsys, tmp_path):
    """`train_quad.py --smoke -o key=value` applies JSON-parsed config
    overrides (the mechanism behind the reference-shipped-recipe runs:
    fixed speed_factor, thresh_div_start 1, suc_up_down -1)."""
    monkeypatch.chdir(tmp_path)
    os.symlink(os.path.join(REPO, "data"), "data")
    _run(
        "train_quad",
        ["train_quad.py", "-s", "ovr", "--smoke", "--no-curriculum",
         "-o", "suc_up_down=-1", "-o", "thresh_div_start=1.5",
         "-o", "speed_factor=0.4"],
        monkeypatch, capsys, cwd=tmp_path,
    )
    with open(os.path.join(
            "trained_models", "quad", "ovr", "config.json")) as f:
        cfg = json.load(f)
    assert cfg["suc_up_down"] == -1
    assert cfg["speed_factor"] == 0.4
    # thresh_div snapshots the live curriculum value, seeded from the
    # overridden thresh_div_start (epoch-0 eval advances it by 0.05)
    assert cfg["thresh_div"] >= 1.5


def test_evaluate_quad_external_sim(monkeypatch, capsys):
    """--external_sim native flies the closed loop through the C++ sim and
    reproduces the jitted evaluator's metrics on the same trajectories."""
    try:
        from apg_trajectory_tracking_tpu.utils.native_runtime import (
            build_native,
        )

        build_native(lib_name="libapgsim.so")
    except (RuntimeError, FileNotFoundError) as exc:
        pytest.skip(f"native toolchain unavailable: {exc}")

    argv = ["evaluate_quad.py", "-m", "assets/quad_trained", "-a", "3"]
    out_jax = _run("evaluate_quad", argv, monkeypatch, capsys)
    out_ext = _run(
        "evaluate_quad", argv + ["--external_sim", "native"],
        monkeypatch, capsys,
    )
    m_jax = json.loads(out_jax[out_jax.rindex("{"):])
    m_ext = json.loads(out_ext[out_ext.rindex("{"):])
    # identical physics; f32 accumulation-order noise (FMA contraction,
    # -march differences) compounds over 251 chaotic closed-loop steps,
    # so pin closeness, not bit-equality (borderline runs can flip one
    # trajectory's stability on another toolchain)
    assert abs(m_ext["ratio_stable"] - m_jax["ratio_stable"]) <= 0.34
    assert abs(m_ext["mean_divergence"] - m_jax["mean_divergence"]) < 0.05


def test_make_tables_quick_wing(monkeypatch, capsys, tmp_path):
    """The one-command table regenerator's CI smoke: the wing section runs
    end-to-end against shipped assets only (APG + PPO + PETS; --skip_mpc
    keeps it fast) and emits the artifact set with CI-annotated rows."""
    out_dir = str(tmp_path / "docs")
    out = _run(
        "make_tables",
        ["make_tables.py", "--quick", "--sections", "wing", "--skip_mpc",
         "--out_dir", out_dir],
        monkeypatch, capsys,
    )
    assert "APG wing_trained" in out
    with open(os.path.join(out_dir, "all_results.json")) as f:
        res = json.load(f)
    rows = res["wing_waypoint"]["results"]
    apg = rows["APG wing_trained"]
    assert apg["n"] == 3
    lo, hi = apg["pass_rate_ci"]
    assert lo <= apg["pass_rate"] <= hi
    with open(os.path.join(out_dir, "tables_manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["sections"]["wing"]["artifact"]
