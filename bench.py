#!/usr/bin/env python
"""Headline benchmark: quad APG training throughput on one chip.

Measures the full concurrent training step (featurize -> controller MLP ->
10-step differentiable-dynamics unroll -> MPC loss -> BPTT -> SGD update) at
4096 environments, the primary metric of BASELINE.json. Prints ONE JSON line.

Besides wall-clock, the line carries the roofline story (VERDICT r1 #3):
per-step FLOPs and HBM bytes from XLA's compiled cost analysis, MFU against
the chip's bf16 peak (the standard MFU convention; the step math is fp32),
nominal bytes-accessed utilization against peak BW, and the regime —
at batch 4096 / 16k / 64k. Arithmetic intensity sits ~50x below the
chip's ridge point, so the MXU is irrelevant and batch scaling is the
lever. Caveats established by experiment (DESIGN.md section 2): XLA's
bytes-accessed is an upper bound on true DRAM traffic — at 64k the
counter reads ~100% of peak BW, yet halving bytes (bf16) leaves
wall-clock flat, so the actual 64k ceiling is VPU issue rate on the
12-wide elementwise chains. The field is named nominal_bytes_util accordingly.

vs_baseline compares against the reference PyTorch implementation's
training throughput measured on this container's CPU at the SAME batch size
(BASELINE_MEASURED.json; the reference's own default config is batch 8,
which is ~200x slower than its batch-4096 number used here).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.dynamics.quad import (
    quad_params,
    quad_step_fast,
)
from apg_trajectory_tracking_tpu.models import init_control_net
from apg_trajectory_tracking_tpu.training.common import sgd_momentum
from apg_trajectory_tracking_tpu.training.train_quad import (
    build_concurrent_step,
)

BATCH = 4096
HORIZON = 10
ROOFLINE_BATCHES = (4096, 16384, 65536)

# (peak bf16 FLOP/s, peak HBM bytes/s) per chip; first substring match wins.
# Sources: public TPU spec sheets (v5e 197 TF bf16 / 819 GB/s, v5p 459 TF /
# 2765 GB/s, v4 275 TF / 1228 GB/s, v6e 918 TF / 1640 GB/s).
PEAKS = (
    ("v5 lite", (197e12, 819e9)),
    ("v5e", (197e12, 819e9)),
    ("v5p", (459e12, 2765e9)),
    ("v5", (459e12, 2765e9)),
    ("v4", (275e12, 1228e9)),
    ("v6 lite", (918e12, 1640e9)),
    ("v6e", (918e12, 1640e9)),
)


def chip_peaks():
    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in PEAKS:
        if key in kind:
            return peaks
    return None, None


# epoch-scan unroll factor (the trainers' promoted configuration; unroll=4
# measured +2.8% over unroll=2, unroll=8 +0.4% more — within noise, so 4 —
# docs/perf_ab_4096.json). The roofline accounting must divide the scan
# BODY's cost analysis by this: XLA counts the body once, and with
# unroll=N the body holds N train steps.
UNROLL = 4


def make_run_iters(step, dyn, iters):
    # The production epoch loop runs all minibatch steps inside ONE jitted
    # lax.scan dispatch (parallel/mesh.py make_sharded_epoch), so the
    # benchmark iterates on device too — a per-step host dispatch would
    # measure the axon tunnel's round-trip latency, not the chip.
    # Donated (net, opt_state) buffers and unroll=4 mirror the trainers'
    # promoted epoch configuration (scripts/perf_ab.py, DESIGN.md §2).
    def run_iters(net, opt_state, states, refs):
        def body(carry, _):
            n, o = carry
            n, o, loss = step(n, o, dyn, states, refs)
            return (n, o), loss

        (net, opt_state), losses = jax.lax.scan(
            body, (net, opt_state), None, length=iters, unroll=UNROLL
        )
        return net, opt_state, losses[-1]

    return jax.jit(run_iters, donate_argnums=(0, 1))


def cost_of(compiled, iters, dt, peak_flops):
    """(flops, bytes) per train step from the iterated-scan executable's
    cost analysis. XLA counts a lax.scan body ONCE regardless of trip
    count (verified against a separately compiled single step: 138.4 MB vs
    141.0 MB at batch 4096), so the program total IS one step's cost. If a
    future XLA multiplies by trip count, the implied FLOP/s would exceed
    the chip's physical peak — normalize by ``iters`` in that case."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        hbm_bytes = float(ca.get("bytes accessed", 0.0))
        if flops <= 0 or hbm_bytes <= 0:
            return None, None
        # the unrolled scan body holds UNROLL train steps but XLA counts
        # it once — normalize to ONE step (verified: r04 reported exactly
        # 2x the r03 per-step flops after the unroll=2 promotion)
        flops /= UNROLL
        hbm_bytes /= UNROLL
        if peak_flops is not None and flops / dt > 2 * peak_flops:
            # cost analysis multiplied by trip count (iters / UNROLL
            # trips): after the UNROLL division above we hold
            # iters / UNROLL steps' worth — normalize by that, not iters
            # (dividing by iters here would undercount by UNROLL)
            flops /= iters / UNROLL
            hbm_bytes /= iters / UNROLL
        return flops, hbm_bytes
    except Exception:
        return None, None


def measure(step, dyn, net, opt_state, batch, iters, repeats, peak_flops):
    rng = np.random.RandomState(0)
    states = jnp.asarray(rng.randn(batch, 12).astype(np.float32) * 0.3)
    refs = jnp.asarray(
        rng.randn(batch, HORIZON, 9).astype(np.float32) * 0.3
    )
    run_iters = make_run_iters(step, dyn, iters)
    # the jit donates (net, opt_state) — own fresh device copies and
    # thread the returned state so the caller's buffers stay valid
    n = jax.tree_util.tree_map(lambda a: jnp.array(np.asarray(a)), net)
    o = jax.tree_util.tree_map(lambda a: jnp.array(np.asarray(a)),
                               opt_state)
    compiled = run_iters.lower(n, o, states, refs).compile()
    n, o, loss = compiled(n, o, states, refs)
    jax.block_until_ready(loss)
    dt = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        n, o, loss = compiled(n, o, states, refs)
        jax.block_until_ready(loss)
        dt = min(dt, (time.perf_counter() - t0) / iters)
    flops, hbm_bytes = cost_of(compiled, iters, dt, peak_flops)
    return dt, flops, hbm_bytes


def roofline_entry(dt, flops, hbm_bytes, peak_flops, peak_bw, batch):
    entry = {
        "time_per_step_ms": round(dt * 1e3, 4),
        "env_steps_per_s": round(batch * HORIZON / dt, 1),
    }
    if flops is not None:
        entry["flops_per_step"] = flops
        entry["hbm_bytes_per_step"] = hbm_bytes
        entry["arithmetic_intensity_flop_per_byte"] = round(
            flops / hbm_bytes, 3
        )
    if flops is not None and peak_flops is not None:
        ridge = peak_flops / peak_bw
        entry["mfu"] = round(flops / dt / peak_flops, 5)
        # NOMINAL: XLA's bytes-accessed counter is an upper bound on true
        # DRAM traffic (re-fused reads count twice), so this can exceed
        # 1.0 — it is a fusion-accounting figure, not physical BW. The
        # bf16/remat experiments (DESIGN.md 2) falsified DRAM-boundness
        # at the batch where it reads ~1.0.
        entry["nominal_bytes_util"] = round(hbm_bytes / dt / peak_bw, 4)
        entry["regime"] = (
            "memory-bound" if flops / hbm_bytes < ridge else "compute-bound"
        )
    return entry


def main():
    key = jax.random.PRNGKey(0)
    net = init_control_net(key, 15, HORIZON, 9, HORIZON * 4, conv=True)
    optimizer = sgd_momentum(1e-5)
    opt_state = optimizer.init(net)
    dyn = quad_params()
    # quad_step_fast is the promoted production training step (perf_ab.py
    # within-session A/B: fast+donate+unroll4 = +5.4% over the round-3
    # path at batch 4096; parity pinned in tests/test_dynamics.py)
    step = build_concurrent_step(quad_step_fast, optimizer, 0.1, HORIZON, 4)

    peak_flops, peak_bw = chip_peaks()

    roofline = {}
    primary = None
    for batch in ROOFLINE_BATCHES:
        # fewer on-device iterations at the big batches keeps total bench
        # time bounded without changing the per-step measurement; keep
        # iters a multiple of UNROLL so the scan has no epilogue trip
        # (a remainder body would be counted in the cost analysis and
        # break the /UNROLL per-step normalization)
        iters = 48 if batch <= 4096 else 20
        repeats = 8 if batch <= 4096 else 4
        dt, flops, hbm_bytes = measure(
            step, dyn, net, opt_state, batch, iters, repeats, peak_flops
        )
        roofline[str(batch)] = roofline_entry(
            dt, flops, hbm_bytes, peak_flops, peak_bw, batch
        )
        if batch == BATCH:
            primary = roofline[str(batch)]

    env_steps_per_s = primary["env_steps_per_s"]

    baseline = 199651.0
    meas_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    if os.path.exists(meas_path):
        with open(meas_path) as f:
            baseline = float(json.load(f)["baseline_for_vs_ratio"])

    out = {
        "metric": "quad_apg_train_env_steps_per_s_per_chip",
        "value": env_steps_per_s,
        "unit": "env-steps/s",
        "vs_baseline": round(env_steps_per_s / baseline, 2),
        "device_kind": jax.devices()[0].device_kind,
        "peak_bf16_flops": peak_flops,
        "peak_hbm_bw": peak_bw,
        "mfu": primary.get("mfu"),
        "nominal_bytes_util": primary.get("nominal_bytes_util"),
        "nominal_bytes_util_note": (
            "upper-bound accounting from XLA bytes-accessed (re-fused "
            "reads double-count); can exceed 1.0 and is NOT physical HBM "
            "bandwidth — bf16/remat A/Bs falsified DRAM-boundness "
            "(DESIGN.md 2)"
        ),
        "vs_baseline_note": (
            "batch-matched reference PyTorch CPU baseline; TPU timings "
            "through this harness's tunnel vary +/-15% across sessions "
            "(DESIGN.md 2), so round-over-round deltas below that are "
            "noise — within-session A/Bs (scripts/perf_ab.py) are the "
            "valid perf evidence"
        ),
        "regime": primary.get("regime"),
        "roofline": roofline,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
