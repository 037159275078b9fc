#!/usr/bin/env python
"""The flagship-capability ablation: does stage-2 diffusion guidance
actually improve masked-region (inpainting) quality?

Weights-free experimental design (no SD/VGG checkpoints exist in this
environment — VERDICT.md round-1 item #2):

  Scene   `make_synthetic_scene.py --task inpaint`: an intruder object is
          "removed"; training images are per-view 2D-inpainted simulations
          (clean background + view-INCONSISTENT tint/noise/blur inside the
          mask). Held-out test views have CLEAN ground truth + intruder
          masks, so masked-region PSNR measures exactly the quantity the
          guidance stage exists to improve.
  Prior   `train_tiny_prior.py`: the tiny flax SD stack trained from
          scratch on procedurally random sphere-worlds (domain prior, the
          weights-free analog of the reference's LoRA scene prior).
  Arms    s1    stage-1 only (DS-NeRF fit of the inconsistent inpaintings)
          nog   stage-2, LPIPS patch loss, NO guidance
          rand  stage-2, LPIPS + CSD guidance from the RANDOM-weight prior
          prior stage-2, LPIPS + CSD guidance from the TRAINED prior

All arms share the stage-1 checkpoint; metrics come from each run's final
held-out eval (masked/unmasked/full PSNR vs clean GT). Reference loss
assembly being ablated: run.py:1470-1517 + sd_utils.py:338-523.

Usage:  python tools/run_ablation.py /tmp/ablation [--iters1 3000]
        [--iters2 2000] [--skip_prior] [--arms s1,nog,rand,prior]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = """
datadir = {scene}
dataset_type = llff
factor = 4
test_split_count = 2
colmap_depth = False
no_tcnn = True
netdepth = 2
netwidth = 64
netdepth_fine = 2
netwidth_fine = 64
N_samples = 32
N_importance = 16
N_rand = 512
basedir = {logs}
expname = {arm}
i_print = 250
i_weights = 1000
i_video = 1000000000
i_testset = 1000000000
render_factor = 0
"""

STAGE2 = """
first_stage = False
lpips = True
patch_len = 32
n_patches = 4
lpips_weight = 0.01
is_normal_guidance = False
use_csd = True
w1 = 1.0
w2 = 0.5
w3 = 0.5
sds_loss_weight = {sds_w}
anneal_iters = {anneal}
sd_latent_size = 128
"""


def run(cmd, log_path):
    print(f"[ablation] $ {' '.join(cmd)}  (log: {log_path})", flush=True)
    with open(log_path, "w") as log:
        r = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT,
                           cwd=ROOT)
    if r.returncode != 0:
        print(open(log_path).read()[-3000:])
        raise SystemExit(f"command failed: {' '.join(cmd)}")


def last_eval(expdir):
    out = {}
    p = os.path.join(expdir, "metrics.jsonl")
    if not os.path.exists(p):
        return out
    for line in open(p):
        rec = json.loads(line)
        if "eval_psnr" in rec:
            out = {k: v for k, v in rec.items() if k.startswith("eval")}
            out["iter"] = rec["iter"]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--iters1", type=int, default=3000)
    ap.add_argument("--iters2", type=int, default=2000)
    ap.add_argument("--sds_w", type=float, default=1e-3)
    ap.add_argument("--anneal", type=int, default=4000)
    ap.add_argument("--prior_steps", type=int, default=4000)
    ap.add_argument("--skip_prior", action="store_true",
                    help="reuse an existing prior ckpt")
    ap.add_argument("--arms", default="s1,nog,rand,prior")
    args = ap.parse_args()

    out = os.path.abspath(args.out)
    scene = os.path.join(out, "scene")
    logs = os.path.join(out, "logs")
    prior = os.path.join(out, "prior.msgpack")
    os.makedirs(logs, exist_ok=True)
    arms = args.arms.split(",")
    py = sys.executable

    if not os.path.isdir(scene):
        run([py, "tools/make_synthetic_scene.py", scene, "--task", "inpaint",
             "--H", "96", "--W", "128", "--n_train", "8", "--n_test", "2"],
            os.path.join(out, "scene.log"))

    wants_prior = any(a.startswith("prior") for a in arms)
    if wants_prior and not args.skip_prior and not os.path.exists(prior):
        run([py, "tools/train_tiny_prior.py", prior, "--res", "128",
             "--steps_unet", str(args.prior_steps)],
            os.path.join(out, "prior.log"))

    def write_cfg(arm, body):
        p = os.path.join(out, f"cfg_{arm}.txt")
        with open(p, "w") as f:
            f.write(COMMON.format(scene=scene, logs=logs, arm=arm) + body)
        return p

    # ---- stage 1 (shared) ----
    s1dir = os.path.join(logs, "s1")
    if not os.path.isdir(os.path.join(s1dir, "ckpt")):
        cfg = write_cfg("s1", f"first_stage = True\n"
                              f"N_iters = {args.iters1}\n"
                              f"i_evaluate = {args.iters1}\n")
        run([py, "run.py", "--config", cfg], os.path.join(out, "s1.log"))

    # ---- stage 2 arms ----
    stage2 = STAGE2.format(sds_w=args.sds_w, anneal=args.anneal)
    n2 = args.iters1 + args.iters2
    arm_cfgs = {
        "nog": "is_rgb_guidance = False\n",
        "rand": "is_rgb_guidance = True\nsd_tiny = True\n",
        "prior": ("is_rgb_guidance = True\nsd_tiny = True\n"
                  f"sd_prior_ckpt = {prior}\n"),
        # The paper's actual novelty (geometric diffusion prior): RGB CSD
        # + normal-map CSD from the same trained prior, normal anneal
        # restarting at stage-2 entry (stable.py normal_start_iter).
        "priorN": ("is_rgb_guidance = True\nis_normal_guidance = True\n"
                   f"normal_start_iter = {args.iters1}\n"
                   "normalmap_render_factor = 4\n"
                   "sd_tiny = True\n"
                   f"sd_prior_ckpt = {prior}\n"),
    }
    for arm in arms:
        if arm == "s1":
            continue
        expdir = os.path.join(logs, arm)
        if os.path.isdir(os.path.join(expdir, "ckpt")):
            print(f"[ablation] {arm}: already run, skipping")
            continue
        os.makedirs(expdir, exist_ok=True)
        shutil.copytree(os.path.join(s1dir, "ckpt"),
                        os.path.join(expdir, "ckpt"))
        cfg = write_cfg(arm, stage2 + arm_cfgs[arm]
                        + f"N_iters = {n2}\ni_evaluate = {n2}\n")
        run([py, "run.py", "--config", cfg], os.path.join(out, f"{arm}.log"))

    # ---- report ----
    results = {arm: last_eval(os.path.join(logs, arm)) for arm in arms}
    with open(os.path.join(out, "ablation.json"), "w") as f:
        json.dump(results, f, indent=2)
    cols = ("eval_psnr_masked", "eval_psnr_unmasked", "eval_psnr")
    print("\n| arm | " + " | ".join(c.replace("eval_", "") for c in cols)
          + " |")
    print("|---" * (len(cols) + 1) + "|")
    for arm in arms:
        r = results[arm]
        print(f"| {arm} | " + " | ".join(
            f"{r[c]:.2f}" if c in r else "—" for c in cols) + " |")
    print(f"\nwrote {os.path.join(out, 'ablation.json')}")


if __name__ == "__main__":
    main()
