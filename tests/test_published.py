"""Anti-drift gate on the PUBLISHED artifacts.

Round-3 verdict: the repo shipped a README whose seven generated table
blocks were EMPTY placeholders, and prose citing docs artifacts
(``docs/all_results.json``, ``docs/wall_protocol.json``, ...) that did not
exist — the table *machinery* was tested on temp dirs
(``test_cli_smoke.py``) but nothing looked at the committed files. These
tests make that failure mode a red suite: they inspect the README and
``docs/`` as committed, not a regeneration in a sandbox.
"""

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
README = os.path.join(REPO, "README.md")

BLOCK_RE = re.compile(
    r"<!-- BEGIN GENERATED: (?P<name>[\w-]+) -->\n(?P<body>.*?)"
    r"<!-- END GENERATED: (?P=name) -->",
    re.DOTALL,
)


def readme_text():
    with open(README) as f:
        return f.read()


def generated_blocks():
    blocks = {m.group("name"): m.group("body").strip()
              for m in BLOCK_RE.finditer(readme_text())}
    assert blocks, "README has no generated blocks at all"
    return blocks


REQUIRED_BLOCKS = {
    "quad_table", "wide_table", "wall_table", "speed_table",
    "cartpole_table", "swingup_table", "wing_table", "models_table",
    "robustness_table", "robustness_adapt_table", "bench_line",
}


def test_all_required_blocks_present():
    """A generated block that silently disappears from the README (e.g.
    a bad marker edit) must fail the suite, not just skip regeneration."""
    missing = REQUIRED_BLOCKS - set(generated_blocks())
    assert not missing, f"README lost generated blocks: {sorted(missing)}"


def test_generated_blocks_are_filled():
    """Every BEGIN/END GENERATED block must contain real content, not the
    '(regenerate with ...)' placeholder it ships with before a
    make_tables run."""
    empty = [
        name for name, body in generated_blocks().items()
        if not body or body.startswith("(regenerate")
    ]
    assert not empty, (
        f"README generated blocks are empty placeholders: {empty} — "
        "run `python scripts/make_tables.py` and commit the output"
    )


def test_generated_tables_have_rows_and_cis():
    """Table blocks must contain a markdown table with at least one data
    row, and every published ratio must carry its 95% CI (the `[lo, hi]`
    rendering of evaluation/stats.fmt_ci)."""
    for name, body in generated_blocks().items():
        if name == "bench_line":
            continue
        rows = [ln for ln in body.splitlines() if ln.startswith("|")]
        assert len(rows) >= 3, (
            f"block '{name}' has no table rows — regenerate it"
        )
        data_rows = [ln for ln in rows[2:] if not set(ln) <= set("|- ")]
        assert data_rows, f"block '{name}' has a header but no data rows"
        # speed_table cells are compact err/stable pairs whose full CI
        # fields live in docs/speed_sweep.json (stated in the README)
        if name == "speed_table":
            continue
        without_ci = [ln for ln in data_rows
                      if "[" not in ln and "—" not in ln]
        assert not without_ci, (
            f"block '{name}' has rows without a CI: {without_ci[:2]}"
        )


def test_bench_line_stamped():
    blocks = generated_blocks()
    assert "bench_line" in blocks
    assert "env-steps/s" in blocks["bench_line"], (
        "bench_line block is not stamped from a BENCH_r*.json artifact"
    )


def cited_paths(text):
    """Every `docs/...` file path mentioned in prose or inline code."""
    return {
        m.group(0).rstrip(".,)`")
        for m in re.finditer(r"docs/[\w.\-]+\.(?:json|md)", text)
    }


@pytest.mark.parametrize("source", ["README.md", "docs/DESIGN.md"])
def test_cited_docs_artifacts_exist(source):
    with open(os.path.join(REPO, source)) as f:
        text = f.read()
    missing = [
        p for p in sorted(cited_paths(text))
        # placeholder patterns like docs/robustness_<model>.json
        if "<" not in p and not os.path.exists(os.path.join(REPO, p))
    ]
    assert not missing, (
        f"{source} cites docs artifacts that do not exist: {missing}"
    )


def test_manifest_matches_committed_artifacts():
    path = os.path.join(REPO, "docs", "tables_manifest.json")
    assert os.path.exists(path), (
        "docs/tables_manifest.json missing — run scripts/make_tables.py"
    )
    with open(path) as f:
        manifest = json.load(f)
    assert manifest.get("quick") is False, (
        "committed manifest came from a --quick run"
    )
    for name, sec in manifest["sections"].items():
        artifact = sec.get("artifact", "")
        if "<" in artifact or artifact.startswith("README.md"):
            continue
        assert os.path.exists(os.path.join(REPO, artifact)), (
            f"manifest section '{name}' points at a missing artifact: "
            f"{artifact}"
        )


def test_wide_protocol_backs_the_champions():
    """The README quotes wide-protocol numbers for the h=14 champions;
    the committed docs/wide_protocol_500.json must actually contain
    them (round-2/3 verdicts: those claims shipped unbacked twice)."""
    path = os.path.join(REPO, "docs", "wide_protocol_500.json")
    assert os.path.exists(path)
    with open(path) as f:
        wide = json.load(f)
    for champ in ("quad_mpc_distilled_h14", "quad_mpc_distilled_lstm_h14",
                  "quad_mpc_distilled_stable_ff",
                  "quad_mpc_distilled_lstm_h14_ff"):
        assert champ in wide["results"], (
            f"wide protocol artifact lacks {champ} — rerun "
            "`make_tables.py --sections wide`"
        )
        row = wide["results"][champ]
        assert {"mean_divergence", "mean_divergence_ci", "ratio_stable",
                "ratio_stable_ci", "n"} <= set(row), row.keys()


def test_robustness_adapt_artifact_backs_the_readme_block():
    """The repair-by-adaptation block renders from the committed
    artifact: every cell carries before/after with n + CIs, the
    infeasible cell carries the rate-authority analysis, and the block
    function reproduces a table from it."""
    path = os.path.join(REPO, "docs", "robustness_adapt.json")
    assert os.path.exists(path)
    with open(path) as f:
        d = json.load(f)
    assert d["cells"], "no repair cells in the artifact"
    feas_flags = []
    for cell, c in d["cells"].items():
        for leg in ("before", "after"):
            assert {"err", "stable", "stable_ci", "n"} <= set(c[leg]), (
                cell, leg)
        assert "identified_params" in c, cell
        assert "rate_authority" in c, cell
        feas_flags.append(c["rate_authority"]["feasible"])
    # the published analysis: at least one provably-infeasible cell and
    # at least two repaired ones
    assert not all(feas_flags), "expected an infeasible cell"
    repaired = [
        c for c in d["cells"].values()
        if c["rate_authority"]["feasible"]
        and c["after"]["stable"] > c["before"]["stable"] + 0.3
    ]
    assert len(repaired) >= 2, "expected >=2 repaired cells"

    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_tables

    cwd = os.getcwd()
    os.chdir(REPO)
    try:
        block = make_tables.robustness_adapt_block()
    finally:
        os.chdir(cwd)
    assert block and block.count("|") > 10
    assert "infeasible for any controller" in block


def test_models_table_covers_shipped_assets():
    """Every shipped quad/cartpole/wing controller asset appears in the
    README models_table block (no silently unpublished model)."""
    blocks = generated_blocks()
    assert "models_table" in blocks, "README lacks the models_table block"
    body = blocks["models_table"]
    assets = os.path.join(REPO, "assets")
    # *_pets / *_ppo_* baseline ensembles appear in head-to-head tables
    # instead; quad_mpc_distilled_apg is an ablation documented in DESIGN
    skip = ("pets", "ppo", "quad_mpc_distilled_apg")
    unlisted = [
        a for a in sorted(os.listdir(assets))
        if os.path.exists(os.path.join(assets, a, "config.json"))
        and not any(s in a for s in skip)
        and f"`{a}`" not in body
    ]
    assert not unlisted, (
        f"shipped assets missing from README models_table: {unlisted}"
    )
