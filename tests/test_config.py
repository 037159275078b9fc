import os

from gbnerf_tpu.config import Config, load_reference_config, save_config

REF_CFG = "/root/reference/DS_NeRF/config/aconfig_1.txt"


def test_load_reference_config():
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
    cfg = Config()
    hash(cfg)  # frozen dataclasses must be usable as jit static args
    p = os.path.join(tmp_path, "config.txt")
    save_config(cfg, p)
    assert os.path.exists(p)
