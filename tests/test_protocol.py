"""Pin the canonical evaluation protocols (VERDICT r2 #2).

Every head-to-head table is defined by (bank generation seed + sizes,
draw seed, speed, thresholds). data/ is not in git — the protocol's
reproducibility rests on generation determinism and on the draw being a
pure function of the seed. These tests freeze both so the protocol
cannot silently drift between table regenerations:

* trajectory-bank generation is bit-deterministic in (seed, sizes);
* ``prepare_trajectory`` (subsampling + speed scaling,
  generate_trajectory.py:566-605 semantics) matches golden values;
* the 100-trajectory quad draw and the 500-trajectory wide draw are the
  exact index sequences the tables were built from.
"""

import numpy as np
import pytest

from apg_trajectory_tracking_tpu.trajectory.generate import (
    generate_trajectory_bank,
    load_trajectory_bank,
    prepare_trajectory,
)


@pytest.fixture(scope="module")
def two_banks(tmp_path_factory):
    a = tmp_path_factory.mktemp("bank_a")
    b = tmp_path_factory.mktemp("bank_b")
    generate_trajectory_bank(str(a), n_train=4, n_test=2)
    generate_trajectory_bank(str(b), n_train=4, n_test=2)
    return str(a), str(b)


def test_bank_generation_is_deterministic(two_banks):
    a, b = two_banks
    ta = load_trajectory_bank(a, test=True)
    tb = load_trajectory_bank(b, test=True)
    assert len(ta) == len(tb) == 2
    for x, y in zip(ta, tb):
        np.testing.assert_array_equal(x, y)


def test_prepare_trajectory_golden(two_banks):
    """Golden values for the protocol's reference preparation (dt 0.1,
    speed 0.4) on the deterministic seed-0 tiny bank."""
    bank = load_trajectory_bank(two_banks[0], test=True)
    ref = prepare_trajectory(bank[0], 0.1, 0.4)
    assert ref.shape == (250, 9)
    assert float(np.abs(ref).sum()) == pytest.approx(5819.442, abs=0.5)
    np.testing.assert_allclose(
        ref[0, :3], [-6.5, 10.0, 10.0], atol=1e-5
    )


def test_canonical_draws_are_pinned():
    """The exact index draws behind the published tables: seed-42 choice
    without replacement — 100-of-100 (quad head-to-head) and 500-of-1000
    (wide protocol). If numpy's RandomState.choice semantics or the
    protocol seeds ever change, the tables are no longer comparable and
    this fails loudly."""
    quad = np.random.RandomState(42).choice(100, 100, replace=False)
    assert sorted(quad.tolist()) == list(range(100))  # full bank, once
    assert quad[:10].tolist() == [83, 53, 70, 45, 44, 39, 22, 80, 10, 0]

    wide = np.random.RandomState(42).choice(1000, 500, replace=False)
    assert len(set(wide.tolist())) == 500
    assert wide[:10].tolist() == [521, 737, 740, 660, 411, 678, 626, 513,
                                  859, 136]


def test_quad_references_uses_pinned_draw(two_banks):
    """compare_baselines.quad_references must implement exactly the
    pinned draw + preparation + z-offset."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts"),
    )
    import compare_baselines as cb

    refs, n = cb.quad_references(
        two_banks[0], 2, 0.1, 0.4, bank_train=4, bank_test=2
    )
    assert n == 2
    bank = load_trajectory_bank(two_banks[0], test=True)
    idx = np.random.RandomState(42).choice(2, 2, replace=False)
    expect = np.stack(
        [prepare_trajectory(bank[i], 0.1, 0.4) for i in idx]
    )
    expect[:, :, 2] += 3.0
    np.testing.assert_allclose(refs, expect)
