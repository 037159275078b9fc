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
  Arms    s1     stage-1 only (DS-NeRF fit of the inconsistent inpaintings)
          nog    stage-2, LPIPS patch loss, NO guidance
          rand   stage-2, LPIPS + CSD guidance from the RANDOM-weight prior
          prior  stage-2, LPIPS + CSD guidance from the TRAINED prior
          priorN prior + normal-map CSD from the same prior (the paper's
                 geometric-prior novelty)
          priorL prior + scene LoRA adapters (the reference's full
                 DreamBooth→guidance workflow, via guidance.sd_lora_ckpt)
          priorNL priorN + scene LoRA — the reference's SHIPPED
                 configuration shape (aconfig_1.txt:19,65)

All arms share the stage-1 checkpoint; metrics come from each run's final
held-out eval (masked/unmasked/full PSNR vs clean GT). Reference loss
assembly being ablated: run.py:1470-1517 + sd_utils.py:338-523.

Usage:  python tools/run_ablation.py /tmp/ablation [--iters1 3000]
        [--iters2 2000] [--skip_prior] [--arms s1,nog,rand,prior]

--production (VERDICT r2 #1: the flagship claim at the reference's workload
scale): factor-4 SPIn-NeRF-like images (252×189), 16 train views, masks of
1.8-6k pixels/view, the production CP field config (rank-16 CP grid,
N_rand=1024, N_samples=N_importance=64 — aconfig_1.txt:32-34), guidance
latents 256², the reference's shipped sds_loss_weight=1e-4 and 20k anneal
denominator (aconfig_1.txt:60, sd_utils.py:444), 10k stage-1 + 10k stage-2
(aconfig_1.txt:66), prior trained at the matching 256² resolution.
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
test_split_count = {n_test}
colmap_depth = {colmap}
lindisp = {lindisp}
{field}
basedir = {logs}
expname = {arm}
i_print = 250
i_weights = 1000
i_video = 1000000000
i_testset = 1000000000
render_factor = 0
"""

FIELD_SMOKE = """no_tcnn = True
netdepth = 2
netwidth = 64
netdepth_fine = 2
netwidth_fine = 64
N_samples = 32
N_importance = 16
N_rand = 512"""

# the production CP field + sampling knobs (configs/spinnerf_scene.txt,
# aconfig_1.txt:32-34); colmap/ndc knobs stay scene-appropriate (the
# synthetic scene ships no sparse depth)
FIELD_PROD = """no_tcnn = False
field_type = cp
cp_bound = 8.0
N_samples = 64
N_importance = 64
N_rand = 1024
raw_noise_std = 1e0"""

STAGE2 = """
first_stage = False
lpips = True
patch_len = 32
n_patches = 4
lpips_weight = 0.01
is_normal_guidance = False
{combine}
sds_loss_weight = {sds_w}
anneal_iters = {anneal}
sd_latent_size = {latent}
{extra}
"""

# Guidance-combine modes (VERDICT r3 #2). `csd` reproduces the round-3 arms
# (3-way combine, the harness's historical flat triple, threaded to BOTH
# modalities now that dispatch reads the per-modality knobs). `sds` is the
# TRUE shipped combine — aconfig_1.txt sets no --use_csd (store_true False,
# run.py:502), so the reference runs 2-way SDS at the per-modality scales
# 7.5 rgb / 1.5 normal (config defaults). `csd_ref` is CSD with the
# reference's own per-modality triples (run.py:503-508 defaults).
COMBINE = {
    "csd": ("use_csd = True\n"
            "rgb_w1 = 1.0\nrgb_w2 = 0.5\nrgb_w3 = 0.5\n"
            "normal_w1 = 1.0\nnormal_w2 = 0.5\nnormal_w3 = 0.5"),
    # sds pins the normal scale the SHIPPED config sets explicitly
    # (aconfig_1.txt:20 = 1.5; the parser default is 7.5, run.py:464)
    "sds": "use_csd = False\nnormal_guidance_scale = 1.5",
    "csd_ref": "use_csd = True",   # per-modality reference defaults apply
}
# arm/log/JSON-key suffix per mode (legacy csd keeps the round-3 bare names
# so --arms reruns merge into the same rows)
COMBINE_TAG = {"csd": "", "sds": "-sds", "csd_ref": "-csdref"}


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
    ap.add_argument("--production", action="store_true",
                    help="reference-workload scale (see module docstring)")
    ap.add_argument("--iters1", type=int, default=None)
    ap.add_argument("--iters2", type=int, default=None)
    ap.add_argument("--sds_w", type=float, default=None)
    ap.add_argument("--anneal", type=int, default=None)
    ap.add_argument("--latent", type=int, default=None,
                    help="guidance latent size (sd_latent_size)")
    ap.add_argument("--H", type=int, default=None)
    ap.add_argument("--W", type=int, default=None)
    ap.add_argument("--n_train", type=int, default=None)
    ap.add_argument("--n_test", type=int, default=None)
    ap.add_argument("--prior_steps", type=int, default=None)
    ap.add_argument("--lora_steps", type=int, default=None,
                    help="scene-LoRA fine-tune steps for the priorL arm")
    ap.add_argument("--family", choices=("spheres", "hard"),
                    default="spheres",
                    help="scene family (make_synthetic_scene.py --family): "
                         "'hard' = textured high-frequency world + "
                         "non-convex torus occluder; the domain prior is "
                         "trained on the matching procedural family")
    ap.add_argument("--seed", type=int, default=0,
                    help="scene-generation seed (fresh world + corruption "
                         "draw; the domain prior is scene-independent and "
                         "can be reused across seeds via --skip_prior)")
    ap.add_argument("--skip_prior", action="store_true",
                    help="reuse an existing prior ckpt")
    ap.add_argument("--lindisp", action="store_true",
                    help="disparity-linear sampling, the reference's "
                         "shipped setting (aconfig_1.txt:45)")
    ap.add_argument("--colmap", action="store_true",
                    help="sparse COLMAP depth supervision, the reference's "
                         "shipped mode (aconfig_1.txt:40-42): the scene "
                         "emits a synthetic sparse/0 model and every arm "
                         "trains with colmap_depth = True")
    ap.add_argument("--arms", default="s1,nog,rand,prior")
    ap.add_argument("--combine", default="csd", choices=sorted(COMBINE),
                    help="guidance combine mode (see COMBINE): csd = the "
                         "round-3 3-way arms; sds = the reference's TRUE "
                         "shipped 2-way combine; csd_ref = 3-way with the "
                         "reference's per-modality triples")
    ap.add_argument("--check", action="store_true",
                    help="write + validate every arm config (effective "
                         "guidance knobs, arm-vs-config consistency) and "
                         "exit WITHOUT training — run this before burning "
                         "TPU-hours on a wrong-mode arm")
    args = ap.parse_args()

    prod = args.production
    dflt = dict(iters1=10000 if prod else 3000,
                iters2=10000 if prod else 2000,
                # reference-shipped guidance weight/anneal in production
                # (aconfig_1.txt:60; sd_utils.py:444)
                sds_w=1e-4 if prod else 1e-3,
                anneal=20000 if prod else 4000,
                latent=256 if prod else 128,
                H=189 if prod else 96, W=252 if prod else 128,
                n_train=16 if prod else 8, n_test=3 if prod else 2,
                prior_steps=6000 if prod else 4000,
                lora_steps=1000 if prod else 300)
    for k, v in dflt.items():
        if getattr(args, k) is None:
            setattr(args, k, v)

    out = os.path.abspath(args.out)
    scene = os.path.join(out, "scene")
    logs = os.path.join(out, "logs")
    prior = os.path.join(out, "prior.msgpack")
    os.makedirs(logs, exist_ok=True)
    arms = args.arms.split(",")
    py = sys.executable

    if not os.path.isdir(scene) and not args.check:
        cmd = [py, "tools/make_synthetic_scene.py", scene, "--task",
               "inpaint", "--H", str(args.H), "--W", str(args.W),
               "--n_train", str(args.n_train), "--n_test", str(args.n_test),
               "--seed", str(args.seed), "--family", args.family]
        if args.colmap:
            cmd.append("--colmap_sparse")
        run(cmd, os.path.join(out, "scene.log"))

    def check_meta(path, want, what):
        """Guard checkpoint reuse: the tiny conv towers LOAD cleanly at a
        different training resolution (no shape error), so a silent
        res-mismatched reuse would corrupt every prior* arm."""
        mpath = path + ".meta.json"
        if os.path.exists(path):
            if os.path.exists(mpath):
                meta = json.load(open(mpath))
                if meta != want:
                    raise SystemExit(
                        f"{what} at {path} was built with {meta}, but this "
                        f"run needs {want} — delete it (or point --out at "
                        "a fresh dir) to retrain.")
            return True
        return False

    wants_prior = any(a.startswith("prior") for a in arms)
    # meta stays {"res"} for the spheres family so pre-round-5 prior ckpts
    # keep validating; a hard-family prior must never silently stand in for
    # a spheres one (or vice versa), so the key appears when it matters
    prior_meta = {"res": args.latent}
    if args.family != "spheres":
        prior_meta["family"] = args.family
    if wants_prior and not args.check and not check_meta(prior, prior_meta, "prior"):
        if args.skip_prior:
            raise SystemExit(f"--skip_prior but no prior at {prior}")
        # prior trained at the guidance resolution (the CSD path resizes
        # every render to latent²; the prior must match)
        run([py, "tools/train_tiny_prior.py", prior,
             "--res", str(args.latent), "--family", args.family,
             "--steps_unet", str(args.prior_steps)],
            # NOT prior.log — the `prior` ARM's run log takes that name
            os.path.join(out, "prior_train.log"))
    if wants_prior and not args.check and not os.path.exists(prior + ".meta.json"):
        json.dump(prior_meta, open(prior + ".meta.json", "w"))

    # priorL: the reference's FULL workflow — DreamBooth-LoRA the prior on
    # the scene's (inpainted) training images with the label masks
    # excluding the corrupted region from the loss, then guide stage-2
    # with prior+adapters (train_dreambooth...py → run.py --model_path;
    # here train_lora.py → guidance.sd_lora_ckpt).
    lora_ckpt = os.path.join(out, "lora",
                             f"lora_{args.lora_steps:06d}.safetensors")
    wants_lora = any(a in ("priorL", "priorNL") for a in arms)
    if wants_lora and not args.check and not check_meta(lora_ckpt, prior_meta, "scene LoRA"):
        run([py, "train_lora.py", "--tiny",
             "--sd_prior_ckpt", prior,
             "--latent_size", str(args.latent),
             "--instance_data_dir",
             os.path.join(scene, "images_4", "RGB_inpainted"),
             "--instance_mask_dir",
             os.path.join(scene, "images_4", "label"),
             "--output_dir", os.path.join(out, "lora"),
             "--max_train_steps", str(args.lora_steps),
             "--train_batch_size", "4",
             "--checkpointing_steps", str(args.lora_steps)],
            os.path.join(out, "lora.log"))
    if wants_lora and not args.check and not os.path.exists(lora_ckpt + ".meta.json"):
        json.dump(prior_meta, open(lora_ckpt + ".meta.json", "w"))

    field = FIELD_PROD if args.production else FIELD_SMOKE
    def write_cfg(arm, body):
        p = os.path.join(out, f"cfg_{arm}.txt")
        with open(p, "w") as f:
            f.write(COMMON.format(scene=scene, logs=logs, arm=arm,
                                  field=field, n_test=args.n_test,
                                  colmap=args.colmap,
                                  lindisp=args.lindisp) + body)
        return p

    # ---- configs (stage 1 + every requested stage-2 arm) ----
    s1dir = os.path.join(logs, "s1")
    s1cfg = write_cfg("s1", f"first_stage = True\n"
                            f"N_iters = {args.iters1}\n"
                            f"i_evaluate = {args.iters1}\n")
    extra = ("cache_masked_latents = True" if args.production else "")
    stage2 = STAGE2.format(combine=COMBINE[args.combine], sds_w=args.sds_w,
                           anneal=args.anneal, latent=args.latent,
                           extra=extra)
    n2 = args.iters1 + args.iters2
    tag = COMBINE_TAG[args.combine]

    def arm_name(arm):
        # s1/nog never dispatch guidance: their rows are combine-independent
        return arm if arm in ("s1", "nog") else arm + tag
    arm_cfgs = {
        "nog": "is_rgb_guidance = False\n",
        "rand": "is_rgb_guidance = True\nsd_tiny = True\n",
        "prior": ("is_rgb_guidance = True\nsd_tiny = True\n"
                  f"sd_prior_ckpt = {prior}\n"),
        # The paper's actual novelty (geometric diffusion prior): RGB CSD
        # + normal-map CSD from the same trained prior, normal anneal
        # restarting at stage-2 entry (stable.py normal_start_iter).
        "priorL": ("is_rgb_guidance = True\nsd_tiny = True\n"
                   f"sd_prior_ckpt = {prior}\n"
                   f"sd_lora_ckpt = {lora_ckpt}\n"),
        # collaborative 4-view guidance (VERDICT r4 #7): the reference's
        # render_path_4view dispatch (run.py:1894-1930, sd_utils.py:525-724)
        # — 4 random training views rendered per iter and guided jointly.
        # Reference ships it OFF (aconfig_1.txt), so this arm is capability
        # evidence, not a headline row.
        "priorC": ("is_rgb_guidance = True\nis_colla_guidance = True\n"
                   "sd_tiny = True\n"
                   f"sd_prior_ckpt = {prior}\n"),
        "priorN": ("is_rgb_guidance = True\nis_normal_guidance = True\n"
                   f"normal_start_iter = {args.iters1}\n"
                   # production keeps the reference's shipped factor 7
                   # (aconfig_1.txt:64); the 96×128 smoke needs 4 for a
                   # usable normal-map resolution
                   f"normalmap_render_factor = {7 if prod else 4}\n"
                   "sd_tiny = True\n"
                   f"sd_prior_ckpt = {prior}\n"),
        # the reference's SHIPPED shape (aconfig_1.txt:19,65): normal
        # guidance AND a scene-LoRA'd prior together
        "priorNL": ("is_rgb_guidance = True\nis_normal_guidance = True\n"
                    f"normal_start_iter = {args.iters1}\n"
                    f"normalmap_render_factor = {7 if prod else 4}\n"
                    "sd_tiny = True\n"
                    f"sd_prior_ckpt = {prior}\n"
                    f"sd_lora_ckpt = {lora_ckpt}\n"),
    }
    cfg_paths = {"s1": s1cfg}
    for arm in arms:
        if arm != "s1":
            cfg_paths[arm] = write_cfg(
                arm_name(arm), stage2 + arm_cfgs[arm]
                + f"N_iters = {n2}\ni_evaluate = {n2}\n")

    if args.check:
        check_arm_configs(args, arms, arm_name, cfg_paths, prior, lora_ckpt)
        return

    # ---- stage 1 (shared) ----
    if not os.path.isdir(os.path.join(s1dir, "ckpt")):
        run([py, "run.py", "--config", s1cfg], os.path.join(out, "s1.log"))

    # ---- stage 2 arms ----
    for arm in arms:
        if arm == "s1":
            continue
        name = arm_name(arm)
        expdir = os.path.join(logs, name)
        if os.path.isdir(os.path.join(expdir, "ckpt")):
            print(f"[ablation] {name}: already run, skipping")
            continue
        os.makedirs(expdir, exist_ok=True)
        shutil.copytree(os.path.join(s1dir, "ckpt"),
                        os.path.join(expdir, "ckpt"))
        run([py, "run.py", "--config", cfg_paths[arm]],
            os.path.join(out, f"{name}.log"))

    # ---- report ----
    results = {arm_name(a): last_eval(os.path.join(logs, arm_name(a)))
               for a in arms}
    # merge with prior partial runs (--arms reruns must not clobber
    # already-recorded arms)
    jpath = os.path.join(out, "ablation.json")
    if os.path.exists(jpath):
        merged = json.load(open(jpath))
        merged.update(results)
        results = merged
    with open(jpath, "w") as f:
        json.dump(results, f, indent=2)
    cols = ("eval_psnr_masked", "eval_psnr_unmasked", "eval_psnr")
    print("\n| arm | " + " | ".join(c.replace("eval_", "") for c in cols)
          + " |")
    print("|---" * (len(cols) + 1) + "|")
    for arm in arms:
        r = results[arm_name(arm)]
        print(f"| {arm_name(arm)} | " + " | ".join(
            f"{r[c]:.2f}" if c in r else "—" for c in cols) + " |")
    print(f"\nwrote {os.path.join(out, 'ablation.json')}")


def check_arm_configs(args, arms, arm_name, cfg_paths, prior, lora_ckpt):
    """--check: load every written arm config through the REAL parser and
    assert arm-vs-config consistency, then exit without training (VERDICT
    r3 #8 — a wrong-mode arm burns hours of TPU before anyone notices)."""
    sys.path.insert(0, ROOT)
    from gbnerf_tpu.config import load_reference_config

    ref_rgb, ref_nrm = (8.5, 7.5, 0.5), (2.5, 1.5, 0.5)
    legacy = (1.0, 0.5, 0.5)
    rows, errs = [], []
    for arm in arms:
        cfg = load_reference_config(cfg_paths[arm])
        g, name = cfg.guidance, arm_name(arm)

        def need(cond, what):
            if not cond:
                errs.append(f"{name}: {what}")

        if arm == "s1":
            need(cfg.train.first_stage, "must be first_stage")
        else:
            need(not cfg.train.first_stage, "must be stage-2")
            need(cfg.train.N_iters == args.iters1 + args.iters2, "N_iters")
            need(g.sds_loss_weight == args.sds_w, "sds_loss_weight")
            need(g.sd_latent_size == args.latent, "sd_latent_size")
        need(cfg.render.lindisp == args.lindisp, "lindisp")
        need(cfg.data.colmap_depth == args.colmap, "colmap_depth")
        if arm == "nog":
            need(not g.is_rgb_guidance, "nog must not dispatch guidance")
        elif arm != "s1":
            need(g.is_rgb_guidance, "guidance arm without is_rgb_guidance")
            need(g.use_csd == (args.combine != "sds"), "use_csd vs combine")
            if args.combine == "sds":
                need(g.normal_guidance_scale == 1.5,
                     "shipped normal scale (aconfig_1.txt:20)")
            trip = ((g.rgb_w1, g.rgb_w2, g.rgb_w3),
                    (g.normal_w1, g.normal_w2, g.normal_w3))
            if args.combine == "csd":
                need(trip == (legacy, legacy), "legacy csd triples")
            elif args.combine == "csd_ref":
                need(trip == (ref_rgb, ref_nrm), "reference csd triples")
            if arm.startswith("prior"):
                need(g.sd_prior_ckpt == prior, "prior ckpt")
            if arm in ("priorL", "priorNL"):
                need(g.sd_lora_ckpt == lora_ckpt, "lora ckpt")
            need(g.is_normal_guidance == (arm in ("priorN", "priorNL")),
                 "is_normal_guidance vs arm")
            need(g.is_colla_guidance == (arm == "priorC"),
                 "is_colla_guidance vs arm")
            if g.is_normal_guidance:
                need(g.normal_start_iter == args.iters1,
                     "normal_start_iter must be stage-2 entry")
        mode = ("s1" if arm == "s1" else
                "off" if not g.is_rgb_guidance else
                "csd" if g.use_csd else "sds")
        rows.append((name, mode,
                     f"{g.rgb_w1}/{g.rgb_w2}/{g.rgb_w3}" if g.use_csd
                     else f"scale {g.guidance_scale}",
                     (f"{g.normal_w1}/{g.normal_w2}/{g.normal_w3}"
                      if g.use_csd else f"scale {g.normal_guidance_scale}")
                     if g.is_normal_guidance else "—",
                     "L" if g.sd_lora_ckpt else "",
                     cfg.train.N_iters))
    print("| arm | combine | rgb | normal | lora | N_iters |")
    print("|---" * 6 + "|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")
    if errs:
        raise SystemExit("[check] FAILED:\n  " + "\n  ".join(errs))
    print(f"[check] OK — {len(arms)} arm configs consistent "
          f"(combine={args.combine}); no training was run.")


if __name__ == "__main__":
    main()
