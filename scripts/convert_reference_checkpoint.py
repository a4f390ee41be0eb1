#!/usr/bin/env python
"""Convert a reference (torch) controller checkpoint into this framework's
format — lets users of the upstream repo carry their trained models over.

Usage: python scripts/convert_reference_checkpoint.py \
           --model_dir /path/to/trained_models/quad/current_model \
           --out trained_models/quad/converted

Requires torch; the reference package must be importable for unpickling
(its dynamics modules import casadi, which is stubbed here if missing).
"""

import argparse
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stub_casadi():
    if "casadi" in sys.modules:
        return
    stub = types.ModuleType("casadi")

    class SX:
        def __init__(self, *a, **k):
            pass

        sym = staticmethod(lambda *a, **k: None)

    stub.SX = SX
    sys.modules["casadi"] = stub


def convert_quad(model_dir, out_dir, model_name="model_quad"):
    import torch
    import jax
    import jax.numpy as jnp
    from apg_trajectory_tracking_tpu.models import init_control_net
    from apg_trajectory_tracking_tpu.utils.checkpoints import save_checkpoint

    net_t = torch.load(
        os.path.join(model_dir, model_name), map_location="cpu",
        weights_only=False,
    )
    sd = net_t.state_dict()
    with open(os.path.join(model_dir, "config.json")) as f:
        ref_cfg = json.load(f)
    horizon = ref_cfg.get("horizon", ref_cfg.get("nr_actions", 10))

    params = init_control_net(
        jax.random.PRNGKey(0), sd["states_in.weight"].shape[1], horizon,
        ref_cfg.get("ref_dim", 9),
        sd["fc_out.weight"].shape[0], conv="conv_ref.weight" in sd,
    )
    params["states_in"] = (
        jnp.asarray(sd["states_in.weight"].numpy().T),
        jnp.asarray(sd["states_in.bias"].numpy()),
    )
    if "conv_ref.weight" in sd:
        params["conv_ref"] = (
            jnp.asarray(sd["conv_ref.weight"].numpy()),
            jnp.asarray(sd["conv_ref.bias"].numpy()),
        )
    for n in ("fc1", "fc2", "fc3", "fc_out"):
        params[n] = (
            jnp.asarray(sd[f"{n}.weight"].numpy().T),
            jnp.asarray(sd[f"{n}.bias"].numpy()),
        )
    cfg = dict(ref_cfg)
    cfg["horizon"] = horizon
    save_checkpoint(out_dir, model_name, params, cfg)
    print("converted", model_dir, "->", out_dir)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--ref_path", default="/root/reference",
                        help="reference repo root (for unpickling)")
    args = parser.parse_args()
    _stub_casadi()
    sys.path.insert(0, args.ref_path)
    convert_quad(args.model_dir, args.out)
