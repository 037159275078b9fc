"""gbnerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) NeRF-inpainting framework.

A from-scratch rebuild of the capabilities of GB-NeRF ("NeRF Inpainting with
Geometric Diffusion Prior and Balanced Score Distillation", arXiv 2411.15551):
DS-NeRF-style depth-supervised coarse/fine NeRF training on LLFF/COLMAP scenes,
masked-region inpainting via Stable-Diffusion-inpainting score distillation
(SDS / CSD / Balanced Score Distillation), normal-map geometry distillation and
LoRA prior fine-tuning — redesigned TPU-first:

- pure-functional jitted render / train steps (no chunk loops: ``lax.map`` +
  XLA fusion replace the reference's --chunk/--netchunk python loops),
- Pallas kernels for the hot paths (inverse-CDF resampling, hash-grid
  encoding),
- a ``jax.sharding.Mesh`` + NamedSharding as the "communication backend"
  (the reference's nn.DataParallel analog),
- orbax checkpointing, typed dataclass configs with reference config-file
  parity.

Layer map (mirrors SURVEY.md §1):
  core/      rays, encodings, fields, sampling, volume rendering   (ref L2)
  ops/       Pallas TPU kernels                                    (ref L0)
  data/      LLFF/COLMAP/Blender loaders, ray banks                (ref L1)
  train/     train loop, losses, checkpointing, eval renders       (ref L3, L8)
  guidance/  diffusion prior, SDS/CSD/BSD, LoRA                    (ref L4-L6)
  parallel/  mesh + sharding setup                                 (ref §2.3)
"""

__version__ = "0.1.0"
