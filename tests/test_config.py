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
