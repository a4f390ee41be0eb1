"""Uncertainty machinery behind the head-to-head tables (VERDICT r2 #2):
Wilson CIs on stability ratios, bootstrap CIs on mean divergence, and the
n + CI fields every metrics dict must now carry."""

import numpy as np
import pytest

from apg_trajectory_tracking_tpu.evaluation.stats import (
    bootstrap_ci,
    fmt_ci,
    mean_with_ci,
    ratio_with_ci,
    steps_balance_summary,
    wilson_ci,
)


def test_wilson_known_values():
    # hand-computed check for 44/50 at z = 1.96:
    # center = (44 + 1.9208) / 53.8415, half = (1.96/53.8415) *
    # sqrt(44*6/50 + 0.9604) -> (0.7620, 0.9438)
    lo, hi = wilson_ci(44, 50)
    assert lo == pytest.approx(0.7620, abs=2e-3)
    assert hi == pytest.approx(0.9438, abs=2e-3)
    # degenerate cases stay inside [0, 1] and are sane
    assert wilson_ci(0, 0) == (0.0, 1.0)
    lo, hi = wilson_ci(50, 50)
    assert hi == 1.0 and 0.9 < lo < 1.0
    lo, hi = wilson_ci(0, 50)
    assert lo == 0.0 and 0.0 < hi < 0.1


def test_wilson_width_shrinks_with_n():
    w20 = np.diff(wilson_ci(18, 20))[0]
    w100 = np.diff(wilson_ci(90, 100))[0]
    w500 = np.diff(wilson_ci(450, 500))[0]
    assert w20 > w100 > w500


def test_bootstrap_ci_covers_mean_and_is_deterministic():
    rng = np.random.RandomState(3)
    x = rng.exponential(0.08, size=100)
    lo, hi = bootstrap_ci(x)
    assert lo < x.mean() < hi
    assert (lo, hi) == bootstrap_ci(x)  # seeded -> reproducible
    # single sample degenerates to the point estimate
    assert bootstrap_ci([0.5]) == (0.5, 0.5)


def test_fragments_and_formatting():
    r = ratio_with_ci([True] * 45 + [False] * 5)
    assert r["n"] == 50 and r["value"] == 0.9
    assert r["ci"][0] < 0.9 < r["ci"][1]
    m = mean_with_ci([1.0, 2.0, 3.0, 4.0])
    assert m["value"] == 2.5 and m["n"] == 4
    assert "%" in fmt_ci(0.9, [0.78, 0.96], pct=True)
    assert fmt_ci(0.074, [0.061, 0.089]) == "0.074 [0.061, 0.089]"


def test_steps_balance_summary():
    s = steps_balance_summary([249, 249, 249, 100])
    assert s["n"] == 4
    assert s["ratio_full"] == pytest.approx(0.75)
    assert s["ratio_full_ci"][0] < 0.75 < s["ratio_full_ci"][1]


def test_quad_metrics_carry_ci_fields():
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import (
        metrics_from_rollout,
    )

    rng = np.random.RandomState(0)
    divs = rng.uniform(0, 0.3, size=(20, 61))
    valid = np.ones((20, 61), dtype=bool)
    m = metrics_from_rollout(divs, valid, 1.0, 61, 60)
    assert m["n"] == 20
    lo, hi = m["ratio_stable_ci"]
    assert lo <= m["ratio_stable"] <= hi
    lo, hi = m["mean_divergence_ci"]
    assert lo <= m["mean_divergence"] <= hi


def test_format_table_renders_ci_and_n():
    from apg_trajectory_tracking_tpu.evaluation.compare import format_table

    rows = {
        "A": {"mean_divergence": 0.074, "mean_divergence_ci": [0.06, 0.09],
              "ratio_stable": 0.9, "ratio_stable_ci": [0.79, 0.96],
              "n": 50},
        "B": {"mean_divergence": 0.1, "ratio_stable": 0.8},
    }
    t = format_table(rows, ("mean_divergence", "ratio_stable"))
    assert "0.074 [0.060, 0.090]" in t
    assert "90% [79, 96]" in t
    assert "| n |" in t and "| 50 |" in t
    assert "80%" in t  # bare ratio still renders as percent
