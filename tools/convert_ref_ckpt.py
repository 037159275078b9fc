#!/usr/bin/env python
"""Convert a reference (GB-NeRF/DS-NeRF torch) checkpoint to this framework.

The reference saves `{global_step, network_fn_state_dict,
network_fine_state_dict, optimizer_state_dict}` every i_weights iters
(/root/reference/run.py:1550-1560), where the networks are the original-NeRF
torch MLPs (run_nerf_helpers.py:75-158). This tool maps those state dicts
onto our `NeRFMLP` flax params (torch Linear [out,in] → Dense kernel
[in,out]; trunk/skip/view-branch topologies are identical, and
`freq_encode` reproduces the reference embedder's interleaved sin/cos
layout) and writes an orbax checkpoint loadable with `--ft_path` — so a
reference user can continue training or render their existing scenes here.

Optimizer moments are NOT converted (fresh Adam state): torch Adam's state
is keyed by parameter order, and warm-started moments buy nothing after the
framework switch.

Usage:
  python tools/convert_ref_ckpt.py ref_060000.tar out_ckpt_dir \
      [--config scene_cfg.txt]

Then:  python run.py --config scene_cfg.txt --set train.ft_path=out_ckpt_dir

Requires a config whose field matches the reference run (no_tcnn MLP arch:
netdepth/netwidth/multires; the tcnn variant's checkpoints are weightless
by the reference's own resume bug — run.py:2199-2202 — so there is nothing
to convert for them; use our CP field and retrain instead).
"""
from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def torch_nerf_to_flax(sd: dict) -> dict:
    """Map a reference NeRF state_dict → NeRFMLP params pytree (numpy).

    Handles both use_viewdirs=True (feature/alpha/views/rgb heads) and
    False (single output head); NeRF_RGB (no alpha_linear) maps the same —
    the missing σ head simply stays absent and must come from
    --alpha_model_path composition, as in the reference.
    """
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    params = {}
    depth = 1 + max(int(m.group(1)) for k in sd
                    if (m := re.match(r"pts_linears\.(\d+)\.weight", k)))
    for i in range(depth):
        params[f"trunk_{i}"] = dense(f"pts_linears.{i}")
    if "output_linear.weight" in sd:
        params["output"] = dense("output_linear")
        return params
    if "alpha_linear.weight" in sd:
        params["sigma"] = dense("alpha_linear")
    params["feature"] = dense("feature_linear")
    params["views_0"] = dense("views_linears.0")
    params["rgb"] = dense("rgb_linear")
    return params


def infer_skips(params: dict) -> tuple:
    """Recover the skip layout from kernel input widths (in > width ⇒ the
    previous layer's output was concatenated with the encoded input)."""
    trunk = sorted((int(k.split("_")[1]) for k in params
                    if k.startswith("trunk_")))
    width = params["trunk_0"]["kernel"].shape[1]
    return tuple(i - 1 for i in trunk[1:]
                 if params[f"trunk_{i}"]["kernel"].shape[0] > width)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tar", help="reference .tar checkpoint")
    ap.add_argument("out", help="output orbax ckpt dir (use as --ft_path)")
    ap.add_argument("--config", help="config txt matching the reference run "
                    "(arch flags); defaults to an 8x256 no_tcnn MLP")
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.tar, map_location="cpu", weights_only=False)
    step = int(ckpt.get("global_step", 0))
    coarse_sd = ckpt.get("network_fn_state_dict")
    fine_sd = ckpt.get("network_fine_state_dict")
    if coarse_sd is None and fine_sd is None:
        raise SystemExit("no network_fn/network_fine state dicts in the tar")

    import jax
    jax.config.update("jax_platforms", "cpu")
    from gbnerf_tpu.config import Config, load_reference_config
    from gbnerf_tpu.train.checkpoint import CheckpointManager
    from gbnerf_tpu.train.state import create_train_state

    import dataclasses
    if args.config:
        cfg = load_reference_config(args.config)
    else:
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, field=dataclasses.replace(cfg.field, no_tcnn=True))
    if not cfg.field.no_tcnn:
        raise SystemExit(
            "config selects the grid field; reference MLP checkpoints only "
            "convert onto no_tcnn=True runs (tcnn tars are weightless, "
            "reference run.py:2199-2202)")
    state, _, _ = create_train_state(cfg, jax.random.PRNGKey(0))

    params = dict(state.params)
    converted = {}
    if coarse_sd is not None:
        converted["coarse"] = torch_nerf_to_flax(coarse_sd)
    if fine_sd is not None and "fine" in params:
        converted["fine"] = torch_nerf_to_flax(fine_sd)
    elif fine_sd is not None:
        print("[convert] tar has network_fine but config has "
              "N_importance=0; dropping the fine net")

    for name, p in converted.items():
        ours = jax.tree_util.tree_map(np.shape, params[name])
        theirs = jax.tree_util.tree_map(np.shape, p)
        if ours != theirs:
            raise SystemExit(
                f"{name} arch mismatch (set netdepth/netwidth/multires to "
                f"the reference run's):\n ours={ours}\n tar ={theirs}\n"
                f" tar skips={infer_skips(p)}")
        params[name] = p

    state = state._replace(
        step=np.asarray(step, np.int32),
        params=params)
    mgr = CheckpointManager(args.out)
    mgr.save(step, state)
    mgr.close()
    nets = "+".join(sorted(converted))
    print(f"[convert] wrote {nets} @ step {step} -> {args.out}\n"
          f"resume:  --set train.ft_path={os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
