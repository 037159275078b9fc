#!/usr/bin/env python
"""Drive the FULL run.py orchestration through the SPMD path end-to-end on
a virtual device mesh (VERDICT r4 #5).

The dryrun entries (`__graft_entry__.dryrun_multichip`) and the sharded ≡
unsharded step-equality tests prove the jitted steps compose with a mesh;
this script proves the *CLI orchestration* does — scene loading, mesh
construction in `train()`, stage-1 data-parallel training, checkpointing,
the stage-2 continuation with guidance TENSOR-parallelism on a
(data, model) mesh, eval dumps, and metrics logging — with no TPU
hardware, on `--xla_force_host_platform_device_count` virtual CPU devices
(the same multi-chip validation seam the driver uses).

Reference seam being replaced: run.py:2146's `torch.nn.DataParallel` — the
reference's only multi-device story. Here the SAME `run.py` CLI runs
1-chip or N-chip; the mesh is auto-built in `train()` (train/loop.py) and
`guidance_tp` adds the model axis.

Usage:
    python tools/run_spmd_demo.py /tmp/spmd_demo [--devices 8] [--tp 2]
        [--iters1 200] [--iters2 30]

Produces <out>/logs/{s1,s2}/metrics.jsonl and asserts on the mesh lines in
the run logs. The committed artifact of the documented run lives in
docs/spmd_cli_r5/ (see docs/SPMD_CLI.md).
"""
from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG_S1 = """
datadir = {scene}
dataset_type = llff
factor = 4
test_split_count = 2
basedir = {logs}
expname = s1
no_tcnn = False
field_type = cp
cp_bound = 8.0
N_samples = 64
N_importance = 64
N_rand = {n_rand}
raw_noise_std = 1e0
first_stage = True
N_iters = {iters1}
i_print = 25
i_weights = {iters1}
i_video = 1000000000
i_testset = 1000000000
i_evaluate = {iters1}
render_factor = 0
"""

CFG_S2 = """
datadir = {scene}
dataset_type = llff
factor = 4
test_split_count = 2
basedir = {logs}
expname = s2
no_tcnn = False
field_type = cp
cp_bound = 8.0
N_samples = 64
N_importance = 64
N_rand = {n_rand}
raw_noise_std = 1e0
first_stage = False
lpips = True
patch_len = 16
n_patches = 2
lpips_weight = 0.01
is_rgb_guidance = True
sd_tiny = True
sd_latent_size = 64
guidance_tp = {tp}
N_iters = {iters2_total}
i_print = 10
i_weights = {iters2_total}
i_video = 1000000000
i_testset = 1000000000
i_evaluate = {iters2_total}
render_factor = 0
"""


def run_cli(cfg_path, log_path, devices):
    env = dict(os.environ)
    env["GBNERF_PLATFORM"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={devices}").strip()
    cmd = [sys.executable, "run.py", "--config", cfg_path]
    print(f"[spmd_demo] $ {' '.join(cmd)}  (devices={devices}, "
          f"log: {log_path})", flush=True)
    with open(log_path, "w") as log:
        r = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT,
                           cwd=ROOT, env=env)
    out = open(log_path).read()
    if r.returncode != 0:
        print(out[-3000:])
        raise SystemExit(f"command failed: {' '.join(cmd)}")
    return out


def last_eval(expdir):
    out = {}
    with open(os.path.join(expdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "eval_psnr" in rec:
                out = rec
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--tp", type=int, default=2,
                    help="guidance tensor-parallel degree (model axis)")
    ap.add_argument("--iters1", type=int, default=100)
    ap.add_argument("--iters2", type=int, default=20)
    ap.add_argument("--n_rand", type=int, default=512,
                    help="rays/iter (production is 1024; the default halves "
                         "it — 8 virtual devices share ONE host core, and "
                         "the demo proves orchestration, not throughput)")
    args = ap.parse_args()

    out = os.path.abspath(args.out)
    scene = os.path.join(out, "scene")
    logs = os.path.join(out, "logs")
    os.makedirs(logs, exist_ok=True)
    py = sys.executable

    if not os.path.isdir(scene):
        subprocess.run(
            [py, "tools/make_synthetic_scene.py", scene, "--task", "inpaint",
             "--H", "96", "--W", "128", "--n_train", "8", "--n_test", "2",
             "--colmap_sparse"],
            check=True, cwd=ROOT)

    # ---- stage 1: data-parallel over all virtual devices ----
    s1cfg = os.path.join(out, "cfg_s1.txt")
    with open(s1cfg, "w") as f:
        f.write(CFG_S1.format(scene=scene, logs=logs, iters1=args.iters1,
                              n_rand=args.n_rand))
    log1 = run_cli(s1cfg, os.path.join(out, "s1.log"), args.devices)
    want1 = f"[mesh] data-parallel over {args.devices} devices"
    assert want1 in log1, f"stage-1 did not build the data mesh: {want1!r}"
    s1 = last_eval(os.path.join(logs, "s1"))
    assert s1.get("iter") == args.iters1, f"stage-1 eval missing: {s1}"

    # ---- stage 2: (data, model) mesh, guidance tensor-parallel ----
    s2cfg = os.path.join(out, "cfg_s2.txt")
    with open(s2cfg, "w") as f:
        f.write(CFG_S2.format(scene=scene, logs=logs, tp=args.tp,
                              n_rand=args.n_rand,
                              iters2_total=args.iters1 + args.iters2))
    s2dir = os.path.join(logs, "s2")
    if not os.path.isdir(os.path.join(s2dir, "ckpt")):
        os.makedirs(s2dir, exist_ok=True)
        shutil.copytree(os.path.join(logs, "s1", "ckpt"),
                        os.path.join(s2dir, "ckpt"))
    log2 = run_cli(s2cfg, os.path.join(out, "s2.log"), args.devices)
    dp = args.devices // args.tp
    want2 = f"[mesh] data×model = {dp}×{args.tp}"
    assert want2 in log2, f"stage-2 did not build the TP mesh: {want2!r}"
    s2 = last_eval(s2dir)
    assert s2.get("iter") == args.iters1 + args.iters2, \
        f"stage-2 eval missing: {s2}"

    report = {
        "devices": args.devices, "tp": args.tp,
        "s1": {k: v for k, v in s1.items() if k.startswith(("eval", "iter"))},
        "s2": {k: v for k, v in s2.items() if k.startswith(("eval", "iter"))},
    }
    with open(os.path.join(out, "spmd_demo.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"[spmd_demo] OK — full CLI orchestration ran on a "
          f"{dp}×{args.tp} virtual mesh; artifacts in {out}")


if __name__ == "__main__":
    main()
