#!/usr/bin/env python
"""Export a trained controller checkpoint to the native runtime format.

Writes a single ``.apgc`` file consumed by ``native/apg_controller.cc`` —
the deployment artifact for running a trained controller outside Python
(onboard computers, the reference's actual target; README "Deployment").

Format: magic ``APGC1\\n`` + uint32 header length + JSON header (dims +
ordered tensor table) + raw little-endian float32 tensor data.

Usage:
    python scripts/export_controller.py -m assets/quad_trained -o quad.apgc
"""

import argparse
import json
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from apg_trajectory_tracking_tpu.data.dataset import WING_MEAN, WING_STD
from apg_trajectory_tracking_tpu.models import (
    init_cartpole_net,
    init_control_net,
    init_lstm_net,
)
from apg_trajectory_tracking_tpu.utils.checkpoints import (
    load_checkpoint,
    load_config,
    resolve_model_dir,
)

# (header name, params key, tuple index) in file order
_TENSOR_ORDER = [
    ("states_in.w", "states_in", 0),
    ("states_in.b", "states_in", 1),
    ("fc1.w", "fc1", 0),
    ("fc1.b", "fc1", 1),
    ("fc2.w", "fc2", 0),
    ("fc2.b", "fc2", 1),
    ("fc3.w", "fc3", 0),
    ("fc3.b", "fc3", 1),
    ("fc_out.w", "fc_out", 0),
    ("fc_out.b", "fc_out", 1),
]


def _write_apgc(out_path, header, params, order):
    tensors = []
    blobs = []
    for hname, key, idx in order:
        leaf = params[key] if idx is None else params[key][idx]
        arr = np.asarray(leaf, dtype="<f4")
        tensors.append([hname, list(arr.shape)])
        blobs.append(arr.tobytes(order="C"))
    header["tensors"] = tensors
    hbytes = json.dumps(header, separators=(",", ":")).encode()
    with open(out_path, "wb") as f:
        f.write(b"APGC1\n")
        f.write(struct.pack("<I", len(hbytes)))
        f.write(hbytes)
        for blob in blobs:
            f.write(blob)
    return header


def _infer_system(model_dir, cfg):
    """``system`` from config when present, else from the checkpoint file
    name (some experiment scripts, e.g. distill_mpc_wing.py, save configs
    without the key)."""
    if cfg.get("system"):
        return cfg["system"]
    from apg_trajectory_tracking_tpu.utils.checkpoints import (
        checkpoint_exists,
    )

    for system in ("quad", "wing", "cartpole"):
        if checkpoint_exists(model_dir, f"model_{system}"):
            return system
    raise ValueError(
        f"{model_dir}: no 'system' in config.json and no model_{{quad,wing,"
        "cartpole}} checkpoint found"
    )


# featurization time steps per system (configs/*.json delta_t)
_DEFAULT_DT = {"quad": 0.1, "wing": 0.05, "cartpole": 0.05}


def export_control_net(model_dir, out_path, name=None):
    """Export a checkpoint (quad / wing / cartpole; concurrent,
    autoregressive, or LSTM mode) to ``out_path``. Returns the header
    dict. Raises ValueError for unsupported train modes."""
    cfg = load_config(model_dir)
    mode = cfg.get("train_mode") or "concurrent"
    if mode not in ("concurrent", "autoregressive", "LSTM"):
        raise ValueError(
            f"native export does not support train_mode={mode}; supported: "
            "concurrent, autoregressive, LSTM"
        )
    system = _infer_system(model_dir, cfg)
    # concurrent nets emit all horizon actions at once; the recurrent
    # modes emit one action per call (train_base.py:119-128)
    out_dim = cfg["action_dim"] * (cfg["horizon"] if mode == "concurrent"
                                   else 1)
    ckpt_name = name or f"model_{system}"
    header = {
        "kind": "control_net",
        "system": system,
        "out_dim": out_dim,
        "action_dim": cfg["action_dim"],
        "horizon": cfg["horizon"],
        "dt": cfg.get("delta_t", _DEFAULT_DT[system]),
    }

    if mode == "LSTM":
        if system != "quad":
            raise ValueError("LSTM export is only wired for quad")
        window = cfg.get("net_window") or cfg["horizon"]
        hidden = cfg.get("hidden") or 8
        template = init_lstm_net(
            jax.random.PRNGKey(0), 15, window, cfg["ref_dim"],
            cfg["action_dim"], conv=True, hidden=hidden,
        )
        params = load_checkpoint(model_dir, ckpt_name, template)
        header.update(kind="lstm_net", state_dim=15, window=window,
                      ref_dim=cfg["ref_dim"], conv=True, hidden=hidden)
        order = [
            ("conv_ref.w", "conv_ref", 0), ("conv_ref.b", "conv_ref", 1),
            ("w_ih", "w_ih", None), ("w_hh", "w_hh", None),
            ("b_ih", "b_ih", None), ("b_hh", "b_hh", None),
            ("fc_out.w", "fc_out", 0), ("fc_out.b", "fc_out", 1),
        ]
        return _write_apgc(out_path, header, params, order)

    if system == "cartpole":
        template = init_cartpole_net(jax.random.PRNGKey(0), 4, out_dim)
        params = load_checkpoint(model_dir, ckpt_name, template)
        header.update(kind="cartpole_net", state_dim=4, window=0,
                      ref_dim=0, conv=False, hidden=0)
        order = [(f"{n}.{s}", n, i)
                 for n in ("fc0", "fc1", "fc2", "fc3", "fc_out")
                 for s, i in (("w", 0), ("b", 1))]
        return _write_apgc(out_path, header, params, order)

    state_dim = 15 if system == "quad" else 9
    window = (cfg.get("net_window") or cfg["horizon"]) if system == "quad" else 1
    conv = system == "quad"
    hidden = cfg.get("hidden") or 64
    template = init_control_net(
        jax.random.PRNGKey(0), state_dim, window, cfg["ref_dim"],
        out_dim, conv=conv, hidden=hidden,
    )
    params = load_checkpoint(model_dir, ckpt_name, template)
    header.update(state_dim=state_dim, window=window, ref_dim=cfg["ref_dim"],
                  conv=conv, hidden=hidden)
    if system == "wing":
        # wing featurization constants (dataset.py WING_MEAN/STD; configs
        # snapshot them as mean/std when present)
        header["mean"] = [float(v) for v in cfg.get("mean") or WING_MEAN]
        header["std"] = [float(v) for v in cfg.get("std") or WING_STD]

    order = list(_TENSOR_ORDER)
    if conv:
        order = [("conv_ref.w", "conv_ref", 0),
                 ("conv_ref.b", "conv_ref", 1)] + order
    else:
        order = [("ref_in.w", "ref_in", 0),
                 ("ref_in.b", "ref_in", 1)] + order
    return _write_apgc(out_path, header, params, order)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True,
                    help="checkpoint dir or run name")
    ap.add_argument("-o", "--out", default=None,
                    help="output .apgc path (default: <model_dir>/controller.apgc)")
    ap.add_argument("--system", default="quad",
                    help="system for run-name resolution (default quad)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (exports are host-side; "
                         "avoids TPU-tunnel init)")
    args = ap.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    model_dir = resolve_model_dir(args.model, args.system)
    out_path = args.out or os.path.join(model_dir, "controller.apgc")
    header = export_control_net(model_dir, out_path)
    size = os.path.getsize(out_path)
    print(json.dumps({"out": out_path, "bytes": size,
                      "system": header["system"],
                      "out_dim": header["out_dim"]}))


if __name__ == "__main__":
    main()
