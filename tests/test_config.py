import os

import pytest

from gbnerf_tpu.config import Config, load_reference_config, save_config

REF_CFG = "/root/reference/DS_NeRF/config/aconfig_1.txt"


def test_load_reference_config():
    if not os.path.exists(REF_CFG):
        pytest.skip("reference checkout not present")
    cfg = load_reference_config(REF_CFG)
    # Values pinned by the shipped reference config.
    assert cfg.field.no_tcnn is False
    assert cfg.render.N_samples == 64
    assert cfg.render.N_importance == 64
    assert cfg.render.no_ndc is True
    assert cfg.render.lindisp is True
    assert cfg.render.white_bkgd is True
    assert cfg.render.raw_noise_std == 1.0
    assert cfg.data.factor == 4
    assert cfg.data.colmap_depth is True
    assert cfg.data.depth_lambda == 0.1
    assert cfg.train.N_rand == 1024
    assert cfg.train.lrate == 0.003
    assert cfg.train.lrate_decay == 10
    assert cfg.train.N_iters == 10001
    assert cfg.train.first_stage is False
    assert cfg.guidance.is_rgb_guidance is True
    assert cfg.guidance.is_normal_guidance is True
    assert cfg.guidance.is_colla_guidance is False
    assert cfg.guidance.guidance_scale == 7.5
    assert cfg.guidance.normal_guidance_scale == 1.5
    assert cfg.guidance.normal_start_iter == 500
    assert cfg.guidance.sds_loss_weight == 1e-4
    assert cfg.guidance.prompt == "a stone park bench"
    assert cfg.guidance.prompt_normal == "a normal map of park bench"


def test_config_hashable_and_roundtrip(tmp_path):
    import dataclasses

    from gbnerf_tpu.config import FieldConfig, GuidanceConfig

    cfg = Config()
    hash(cfg)  # frozen dataclasses must be usable as jit static args
    p = os.path.join(tmp_path, "config.txt")
    save_config(cfg, p)
    # the dump is RELOADABLE: load(save(cfg)) == cfg, including tuple knobs
    # and string knobs with numeric-looking values (sd_version = 1.5)
    assert load_reference_config(p) == cfg
    cfg2 = Config(guidance=GuidanceConfig(tp=2, t_range=(0.05, 0.9)),
                  field=FieldConfig(cp_resolutions_coarse=(17, 33, 65)))
    save_config(cfg2, p)
    assert load_reference_config(p) == cfg2


def test_reference_config_none_reset_and_coarse_coercion(tmp_path):
    """`cp_resolutions_coarse = None` resets cleanly; a bare int/float
    becomes a 1-tuple; lpips_weights maps through (review findings)."""
    from gbnerf_tpu.config import load_reference_config

    p = tmp_path / "c.txt"
    p.write_text("cp_resolutions_coarse = None\n"
                 "cp_rank_coarse = None\n"
                 "lpips_weights = /some/vgg.npz\n")
    cfg = load_reference_config(str(p))
    assert cfg.field.cp_resolutions_coarse is None
    assert cfg.field.cp_rank_coarse is None
    assert cfg.train.lpips_weights == "/some/vgg.npz"

    p.write_text("cp_resolutions_coarse = 65\n")
    cfg = load_reference_config(str(p))
    assert cfg.field.cp_resolutions_coarse == (65,)

    p.write_text("cp_resolutions_coarse = 17,33,65\n")
    cfg = load_reference_config(str(p))
    assert cfg.field.cp_resolutions_coarse == (17, 33, 65)


def test_guidance_tp_flag(tmp_path):
    """guidance_tp maps to guidance.tp (tensor-parallel guidance knob;
    exercised end-to-end in test_parallel.py::
    test_stage2_tp_guidance_over_2d_mesh)."""
    from gbnerf_tpu.config import load_reference_config

    p = tmp_path / "c.txt"
    p.write_text("guidance_tp = 2\n")
    assert load_reference_config(str(p)).guidance.tp == 2


def test_no_dead_config_knobs():
    """Guard: every config dataclass field is referenced somewhere outside
    config.py (VERDICT r2 item #5 — automates the round-2 manual dead-knob
    audit, commit c4fe9ea, that caught the unwired sigma-loss class).
    Intentional no-ops go in ALLOWED_DEAD with a reason."""
    import dataclasses
    import re

    import gbnerf_tpu.config as cfgmod

    ALLOWED_DEAD = {
        # name: reason
    }

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sources = []
    for base, _, files in os.walk(os.path.join(root, "gbnerf_tpu")):
        for f in files:
            if f.endswith(".py") and f != "config.py":
                sources.append(os.path.join(base, f))
    for f in ("run.py", "train_lora.py", "bench.py", "__graft_entry__.py"):
        p = os.path.join(root, f)
        if os.path.exists(p):
            sources.append(p)
    blob = "\n".join(open(p, encoding="utf-8").read() for p in sources)

    fields = set()
    for obj in vars(cfgmod).values():
        if dataclasses.is_dataclass(obj) and isinstance(obj, type):
            fields.update(f.name for f in dataclasses.fields(obj))

    dead = sorted(
        name for name in fields
        if name not in ALLOWED_DEAD
        and not re.search(rf"\b{re.escape(name)}\b", blob))
    assert not dead, (
        f"config knobs referenced nowhere outside config.py: {dead} — "
        f"wire them or add to ALLOWED_DEAD with a reason")


REF_RUNPY = "/root/reference/run.py"

# Reference flags deliberately NOT in _FLAG_MAP, each with evidence of why
# (VERDICT r3 #4). Categories: dead = parsed but zero consumers outside the
# parser; dead-shipped = consumer exists only on a branch the shipped
# config/default never takes; covered = the capability exists here under a
# different (documented) knob/design; torch-rt = CUDA/torch-runtime knob
# with no TPU analog (compute_dtype / jit cover the concern).
REF_FLAGS_IGNORED = {
    "guidance_scale": "dead-shipped: default 75 (run.py:459), consumed "
                      "only by the is_crop RGB branch (nerf/utils.py:283) "
                      "— shipped is_crop=False (allowlisted divergence "
                      "below). The LIVE RGB scale is rgb_guidance_scale "
                      "(mapped); aliasing this flag onto it would let a "
                      "crop-branch config silently 10x the SDS scale.",
    # --- dead: zero `.flag` consumers anywhere in run.py + DS_NeRF/ ---
    "adam2_RMS": "dead (no consumer)",
    "adam2_SGD": "dead (no consumer)",
    "calculate_m": "dead (no consumer)",
    "calculate_m_iter": "dead (no consumer)",
    "clf_reg_weight": "dead (no consumer)",
    "clf_weight": "dead (no consumer)",
    "colla_start": "dead: the colla dispatch gates on `i > 0`, not "
                   "colla_start (nerf/utils.py:296)",
    "depth_with_rgb": "dead (no consumer)",
    "i_feat": "dead (no consumer; set in aconfig_1.txt:47 but never read)",
    "i_img": "dead (no consumer)",
    "lpips_batch_size": "dead (no consumer)",
    "lpips_render_factor": "dead (no consumer)",
    "m_smooth": "dead (no consumer)",
    "normalize_depth": "dead (no consumer)",
    "patch_len_factor": "dead (no consumer)",
    "precrop_frac": "dead (no consumer; stable-dreamfusion legacy)",
    "precrop_iters": "dead (no consumer; stable-dreamfusion legacy)",
    "progressive_level": "dead (no consumer)",
    "real_use_around": "dead (no consumer)",
    "relative_loss": "dead (no consumer)",
    "rgb_start": "dead: the rgb dispatch has no start gate "
                 "(nerf/utils.py:281)",
    "sds_loss": "dead (no consumer; sds_loss_weight is the live knob)",
    "sigma_loss": "boolean gate (run.py:2122); our gate is "
                  "train.sigma_loss_weight > 0 (mapped) — the reference's "
                  "own weight flag sigma_lambda is unreferenced",
    "shape": "dead (no consumer)",
    "sigma_lambda": "dead (no consumer; the sigma loss is added "
                    "unweighted, run.py:1516)",
    "text_depth": "dead: the depth-guidance path that would read it is "
                  "commented out (run.py:476-477, utils.py dispatch absent)",
    "tmp_images": "dead (no consumer)",
    "use_clipaway_combine": "dead (no consumer)",
    "weighted_loss": "dead (no consumer)",
    "save_guidance_path": "dead: passed into every train_step "
                          "(utils.py:285-308) whose bodies never read the "
                          "parameter (sd_utils.py:339,526)",
    "train_gt": "dead: force-overwritten to True before any read "
                "(run.py:705)",
    "feat_weight": "dead-shipped: read only by the tkinter GUI "
                   "(run.py:2482) whose launch is commented out "
                   "(run.py:957-959; SURVEY §2.2)",
    # --- dead-shipped: consumer exists, branch never taken at defaults ---
    "depth_loss": "dead-shipped: gated on `depth_loss and not colmap_depth` "
                  "(run.py:1475); shipped colmap_depth=True kills it; the "
                  "term itself (inpainted-depth MSE) is always-on here via "
                  "data.depth_lambda",
    "use_depth_scale": "default-False scale/shift-aligned depth loss "
                       "(run.py:1511); our scale-shift + gradient_loss "
                       "losses cover the aligned-depth capability "
                       "(train/losses.py, goldened)",
    "use_ref": "default-False hard-coded hack: extra MSE on view 68-40 "
               "only (run.py:1378,1508)",
    "cream_loss": "default-False loader variant feeding the use_ref hack "
                  "(load_llff.py:68,335)",
    "N_gt": "split-surgery knob, shipped 0 = no-op (aconfig_1.txt:4, "
            "run.py:842-849); splits here are llffhold/test_split_count",
    "N_train": "only read when N_gt>0 (run.py:845); see N_gt",
    "train_scene": "manual train-index override, shipped None "
                   "(run.py:815-818); covered by llffhold/test_split_count",
    "test_scene": "manual test-index override, shipped None "
                  "(run.py:808-809); covered by llffhold/test_split_count",
    "object_removal": "only effect is masks=np.abs(masks) (run.py:758,831); "
                      "this pipeline takes |mask| unconditionally "
                      "(guidance/stable.py, rays_bank)",
    "prepare": "SPIn-NeRF dataset-PREP loader mode (load_llff.py:68, "
               "load_colmap_depth prepare=), default False; preprocessing "
               "lives in tools/imgs2poses.py + make_synthetic_scene.py",
    "debug": "print-only (echoes i_train, run.py:760,773,844)",
    "masked_NeRF": "only affects the expname suffix string (run.py:1574)",
    "no_geometry": "only affects the expname suffix string (run.py:1577)",
    "second_stage": "stage selection here is first_stage=False (mapped); "
                    "the masked-region stage-2 sampling it gates "
                    "(run.py:1302) is step.py's design (component #14)",
    "no_batching": "use_batching = not no_batching (run.py:1027), shipped "
                   "False → batching on; rays_bank always batches",
    "no_coarse": "default-False 'skip coarse loss' variant (run.py:1513,"
                 "2033); the hierarchical coarse pass is integral here "
                 "(proposal design); default behavior identical",
    "i_embed": "embedder selector (0=positional default, run.py:2006); "
               "only the positional path is live in the shipped config; "
               "core/encoding.py implements it",
    "render_mypath": "alternative hard-coded render path (run.py:930), "
                     "default False; spiral path implemented",
    "is_crop": "default-False crop-bbox guidance variant; divergence "
               "documented at train/step.py (crop branch note)",
    "image": "feeds only CLIP image embeds (utils.py:217-219); the CLIP "
             "loss dispatch is commented out (utils.py:312-316) — same "
             "parity basis as clip_guidance (component #19)",
    "fovy_range": "Perp-Neg orbit fovy sampling; our rand_poses uses scene "
                  "intrinsics — the reference's progressive branch reads "
                  "parser-undefined attrs (config.py perpneg note)",
    "uniform_sphere_rate": "force-overwritten to 0 before use "
                           "(run.py:1197); rand_poses implements the =0 "
                           "behavior",
    "config": "the config-file flag itself — run.py's own --config",
    # --- offline LoRA-trainer knobs: live in train_lora.py's parser ---
    "adam_beta1": "LoRA-trainer optimizer knob (train_dreambooth...py:762); "
                  "covered by train_lora.py --adam_beta1",
    "adam_beta2": "see adam_beta1",
    "adam_epsilon": "see adam_beta1 (train_lora.py --adam_epsilon)",
    "adam_weight_decay": "see adam_beta1 (train_lora.py "
                         "--adam_weight_decay)",
    "learning_rate": "LoRA-trainer LR (train_dreambooth...py:761); covered "
                     "by train_lora.py --learning_rate",
    # --- torch/CUDA runtime knobs, no TPU analog ---
    "fp16": "torch AMP toggle (run.py:1207, pgc.py); precision here is "
            "field.compute_dtype + per-op dtypes",
    "vram_O": "CUDA VRAM-saving toggle (attention slicing etc.); "
              "irrelevant under XLA",
    "hf_key": "HuggingFace hub key — no network egress; weights load from "
              "guidance.sd_weights_dir",
    "netchunk": "eager pointwise chunk size (run.py:2062); jit removes the "
                "eager chunk loop (render.render_block covers ray "
                "chunking)",
}


@pytest.mark.skipif(not os.path.exists(REF_RUNPY),
                    reason="reference checkout not present")
def test_reference_flag_surface_audit():
    """Every flag the reference's config_parser actually defines is either
    mapped in _FLAG_MAP or on the documented-ignore allowlist above with
    evidence (VERDICT r3 #4 — makes the rgb_w1-class of silent parity gap
    impossible). Also fails on STALE allowlist entries (flag renamed/
    removed upstream, or later mapped)."""
    import re

    from gbnerf_tpu.config import _FLAG_MAP

    src = open(REF_RUNPY).read()
    m = re.search(r"def config_parser\(\).*?(?=\ndef |\Z)", src, re.S)
    assert m, "config_parser not found in reference run.py"
    flags = []
    for line in m.group(0).splitlines():
        s = line.strip()
        if s.startswith("#"):
            continue  # commented-out add_argument lines are not flags
        mm = re.search(r"add_argument\(\s*['\"]--([A-Za-z0-9_]+)", s)
        if mm:
            flags.append(mm.group(1))
    assert len(flags) > 140, f"parser extraction broke ({len(flags)} flags)"

    unhandled = [f for f in flags
                 if f not in _FLAG_MAP and f not in REF_FLAGS_IGNORED]
    assert not unhandled, (
        "reference flags neither mapped nor on the documented-ignore "
        f"allowlist: {unhandled}")

    stale = [f for f in REF_FLAGS_IGNORED if f not in flags]
    assert not stale, f"allowlist entries not in the reference parser: {stale}"
    double = [f for f in REF_FLAGS_IGNORED if f in _FLAG_MAP]
    assert not double, f"allowlisted AND mapped (drop one): {double}"
