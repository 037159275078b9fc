from .schedule import DiffusionSchedule
from .sds import (cfg_combine_sds, cfg_combine_bsd, cfg_combine_colla,
                  inject_gradient, score_distillation_grad)
from .unet import UNet2DCondition, UNetConfig
from .vae import AutoencoderKL, VAEConfig, SD_VAE_SCALING
from .text import CLIPTextEncoder, CLIPTextConfig, Tokenizer
from .stable import SDModules, build_sd_modules, make_guidance_fn, sd_train_step
from .perpneg import weighted_perpendicular_aggregator, get_perpendicular_component
from .orchestrator import rand_poses, ProgressiveViews

__all__ = [
    "DiffusionSchedule",
    "cfg_combine_sds", "cfg_combine_bsd", "cfg_combine_colla",
    "inject_gradient", "score_distillation_grad",
    "UNet2DCondition", "UNetConfig",
    "AutoencoderKL", "VAEConfig", "SD_VAE_SCALING",
    "CLIPTextEncoder", "CLIPTextConfig", "Tokenizer",
    "SDModules", "build_sd_modules", "make_guidance_fn", "sd_train_step",
    "weighted_perpendicular_aggregator", "get_perpendicular_component",
    "rand_poses", "ProgressiveViews",
]
