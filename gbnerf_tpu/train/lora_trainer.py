"""DreamBooth-inpaint LoRA fine-tuning (offline prior training).

Parity with /root/reference/DS_NeRF/guidance/
train_dreambooth_inpaint_lora_normal_caption.py: instance images + per-image
caption txt files (RGB *and* normal-map pairs with caption prefixes — see
tools/comp_caption.py), random rectangle/ellipse masks per step (:69-93),
9-channel UNet input assembly, ε-MSE (optionally masked by instance masks
under prior preservation :989-996), checkpointing every N steps, resume.

TPU-native: the UNet/VAE/text towers are frozen (stop-gradient); only the
LoRA adapter tree (guidance/lora.py) trains. The step jits once with the
batch sharded over the mesh's data axis — the reference's HF-Accelerate DDP
(:491-496) becomes a NamedSharding, gradient all-reduce comes from XLA.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..guidance.lora import (TEXT_TARGETS, apply_lora, init_lora,
                             lora_param_count, save_lora)
from ..guidance.schedule import DiffusionSchedule
from ..guidance.stable import SDModules
from ..guidance.vae import AutoencoderKL


def random_mask(rng: np.random.Generator, h: int, w: int,
                ratio: Tuple[float, float] = (0.25, 1.0)) -> np.ndarray:
    """Random rectangle or ellipse mask (reference random_mask :69-93)."""
    mask = np.zeros((h, w), np.float32)
    size = rng.uniform(*ratio)
    mw, mh = int(w * size * rng.uniform(0.5, 1.0)), int(h * size * rng.uniform(0.5, 1.0))
    mw, mh = max(mw, 4), max(mh, 4)
    x0 = rng.integers(0, max(w - mw, 1))
    y0 = rng.integers(0, max(h - mh, 1))
    if rng.random() < 0.5:
        mask[y0:y0 + mh, x0:x0 + mw] = 1.0
    else:
        yy, xx = np.mgrid[0:h, 0:w]
        cy, cx = y0 + mh / 2, x0 + mw / 2
        mask[((xx - cx) / (mw / 2)) ** 2 + ((yy - cy) / (mh / 2)) ** 2 <= 1] = 1.0
    return mask


@dataclass
class DreamBoothInpaintDataset:
    """Host-side dataset: images + caption txts (+ optional instance masks).

    Layout parity: an instance dir of images with same-stem .txt captions
    (the reference hard-codes a caption dir; we take it alongside or via
    caption_dir), optional instance-mask dir for masked loss.
    """

    instance_dir: str
    caption_dir: Optional[str] = None
    mask_dir: Optional[str] = None
    resolution: int = 512
    # Caption when no .txt exists — the class dataset under prior
    # preservation captions every image with class_prompt (reference
    # PromptDataset + collate, train_dreambooth...py:365-378, 476-489).
    default_caption: str = ""

    def __post_init__(self):
        import imageio.v2 as imageio

        exts = (".png", ".jpg", ".jpeg", ".JPG", ".PNG")
        self.files = [os.path.join(self.instance_dir, f)
                      for f in sorted(os.listdir(self.instance_dir))
                      if f.endswith(exts)]
        if not self.files:
            raise FileNotFoundError(f"no images in {self.instance_dir}")
        self._imread = imageio.imread

    def __len__(self):
        return len(self.files)

    def caption(self, idx: int) -> str:
        stem = os.path.splitext(os.path.basename(self.files[idx]))[0]
        cdir = self.caption_dir or self.instance_dir
        p = os.path.join(cdir, stem + ".txt")
        if os.path.exists(p):
            return open(p).read().strip()
        return self.default_caption

    def image(self, idx: int) -> np.ndarray:
        import cv2

        img = np.asarray(self._imread(self.files[idx]))[..., :3]
        # 16-bit PNGs (imageio returns uint16) would WRAP modulo 256 under a
        # bare astype(uint8); rescale any >8-bit integer input first.
        if img.dtype == np.uint16:
            img = (img // 257).astype(np.uint8)
        elif img.dtype != np.uint8:
            img = np.clip(np.round(
                img.astype(np.float32)
                * (255.0 if img.max() <= 1.0 else 1.0)), 0, 255
            ).astype(np.uint8)
        img = cv2.resize(img, (self.resolution, self.resolution),
                         interpolation=cv2.INTER_AREA)
        # uint8 on host: the batch ships through a ~30 MB/s tunnel, so the
        # [-1, 1] normalization happens on DEVICE (loss_fn) at 4x less
        # transfer (B=4 512² f32 = 12 MB/step ≈ 0.4 s; u8 = 3 MB).
        return img.astype(np.uint8)

    def instance_mask(self, idx: int) -> Optional[np.ndarray]:
        if not self.mask_dir:
            return None
        import cv2

        stem = os.path.splitext(os.path.basename(self.files[idx]))[0]
        for ext in (".png", ".jpg"):
            p = os.path.join(self.mask_dir, stem + ext)
            if os.path.exists(p):
                m = np.asarray(self._imread(p)).astype(np.float32)
                if m.ndim > 2:
                    m = m[..., 0]
                m = cv2.resize(m, (self.resolution, self.resolution),
                               interpolation=cv2.INTER_NEAREST)
                return (m > 127).astype(np.float32)
        return None

    def batch(self, rng: np.random.Generator, batch_size: int):
        """Sample a host batch: images, random masks, caption strings."""
        idx = rng.integers(0, len(self.files), batch_size)
        imgs = np.stack([self.image(i) for i in idx])
        masks = np.stack([random_mask(rng, self.resolution, self.resolution)
                          for _ in range(batch_size)]).astype(np.uint8)
        captions = [self.caption(i) for i in idx]
        imasks = [self.instance_mask(i) for i in idx]
        if any(m is not None for m in imasks):
            imasks = np.stack([
                m if m is not None else np.ones((self.resolution,) * 2,
                                                np.float32)
                for m in imasks]).astype(np.uint8)
        else:
            imasks = None
        return imgs, masks, captions, imasks


def make_lora_train_step(mods: SDModules, *, rank: int = 32,
                         lr: float = 1e-4, masked_loss: bool = False,
                         mesh=None, mesh_axis: str = "data",
                         prior_preservation: bool = False,
                         prior_loss_weight: float = 1.0,
                         text_tower=None, text_rank: int = 4):
    """Build (init_fn, step_fn) for LoRA training.

    step(lora_params, opt_state, batch, rng) → (lora_params, opt_state,
    metrics); batch = {image [B,S,S,3] u8 or [-1,1] f32, mask [B,S,S],
    embeds [B,L,D], instance_mask [B,S,S] | None}.

    mesh: optional jax.sharding.Mesh — the reference's HF-Accelerate DDP
    (train_dreambooth...py:491-496) becomes SPMD data parallelism: the
    batch is sharding-constrained over ``mesh_axis`` (one sample group per
    device), LoRA/frozen params stay replicated, and XLA inserts the
    gradient all-reduce over ICI. Same step code 1-chip or N-chip.

    prior_preservation: the batch's leading axis is [instance ‖ class]
    halves; the loss becomes instance-term (optionally instance-masked) +
    prior_loss_weight · class-term, exactly the reference's chunked two-term
    assembly (train_dreambooth...py:985-999).

    text_tower: optional (text_module, text_params) — attaches rank-4/α-4
    q/k/v/out_proj adapters to the text encoder and runs it INSIDE the loss
    on batch["input_ids"] (reference --train_text_encoder, :655-663); the
    adapter tree becomes {"unet": …, "text": …}.
    """
    from .step import _make_ray_constraint

    sched: DiffusionSchedule = mods.schedule
    tx = optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=1e-2)
    constrain_batch = _make_ray_constraint(mesh, mesh_axis)

    def init_fn(rng):
        k_u, k_t = jax.random.split(rng)
        lora = init_lora(k_u, mods.unet_params, rank=rank)
        if text_tower is not None:
            lora = {"unet": lora,
                    "text": init_lora(k_t, text_tower[1], rank=text_rank,
                                      targets=TEXT_TARGETS)}
        return lora, tx.init(lora)

    def loss_fn(lora, frozen, batch, rng):
        k_noise, k_t, k_enc1, k_enc2 = jax.random.split(rng, 4)
        unet_lora = lora["unet"] if text_tower is not None else lora
        eff_params = apply_lora(jax.lax.stop_gradient(frozen["unet"]),
                                unet_lora, rank=rank)
        if text_tower is not None:
            # α = r = 4 → scale 1 (reference text LoraConfig :656-663)
            text_eff = apply_lora(jax.lax.stop_gradient(frozen["text"]),
                                  lora["text"], rank=text_rank)
            embeds = text_tower[0].apply({"params": text_eff},
                                         batch["input_ids"])
        else:
            embeds = batch["embeds"]
        image, mask = batch["image"], batch["mask"]
        if image.dtype == jnp.uint8:      # host ships u8; normalize on device
            image = image.astype(jnp.float32) / 127.5 - 1.0
        mask = mask.astype(jnp.float32)
        B = image.shape[0]
        lr_res = image.shape[1] // 8

        enc = lambda img, k: mods.vae.apply(
            {"params": frozen["vae"]}, img, k, method=AutoencoderKL.encode)
        latents = jax.lax.stop_gradient(enc(image, k_enc1))
        masked_img = image * (mask[..., None] < 0.5)
        masked_latents = jax.lax.stop_gradient(enc(masked_img, k_enc2))
        mask_lat = jax.image.resize(mask[..., None],
                                    (B, lr_res, lr_res, 1), "nearest")

        t = jax.random.randint(k_t, (B,), 0, sched.num_train_timesteps)
        noise = jax.random.normal(k_noise, latents.shape)
        noisy = sched.add_noise(latents, noise, t)

        unet_in = jnp.concatenate([noisy, mask_lat, masked_latents], axis=-1)
        pred = mods.unet.apply({"params": eff_params}, unet_in, t, embeds)
        err = (pred - noise) ** 2

        def instance_weight(imask, n):
            # (1 - instance_mask)·mse then a PLAIN mean over all latent
            # pixels — the reference does not renormalize by the unmasked
            # count (:989-992); parity kept.
            return 1.0 - jax.image.resize(
                imask.astype(jnp.float32)[..., None],
                (n, lr_res, lr_res, 1), "nearest")

        if prior_preservation:
            half = B // 2
            err_i, err_p = err[:half], err[half:]
            if masked_loss and batch.get("instance_mask") is not None:
                err_i = err_i * instance_weight(
                    batch["instance_mask"][:half], half)
            return jnp.mean(err_i) + prior_loss_weight * jnp.mean(err_p)
        if masked_loss and batch.get("instance_mask") is not None:
            err = err * instance_weight(batch["instance_mask"], B)
        return jnp.mean(err)

    @jax.jit
    def _step(lora, opt_state, frozen, batch, rng):
        batch = dict(batch,
                     **constrain_batch({k: v for k, v in batch.items()
                                        if v is not None}))
        loss, grads = jax.value_and_grad(loss_fn)(lora, frozen, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, {"loss": loss}

    # The frozen towers ride as jit ARGUMENTS (design invariant: closure
    # capture baked the 3.57 GB UNet/VAE into the executable as constants,
    # which also has to ship through the ~30 MB/s tunnel per compile).
    frozen = {"unet": mods.unet_params, "vae": mods.vae_params}
    if text_tower is not None:
        frozen["text"] = text_tower[1]

    def step(lora, opt_state, batch, rng):
        return _step(lora, opt_state, frozen, batch, rng)

    return init_fn, step


def save_lora_checkpoint(output_dir: str, step: int, lora, opt_state,
                         rng, host_rng: np.random.Generator) -> str:
    """Write a resumable `checkpoint-{step}/` dir (reference accelerate
    save_state, train_dreambooth...py:701-741,1010-1014): adapters +
    optimizer state (state.msgpack) and step + BOTH rng streams
    (meta.json). Saving the rng states is our replacement for the
    reference's resume-by-skipping-dataloader-steps (:918-926) — restoring
    them continues the exact sample/noise streams, so train(2N) ≡
    train(N) + resume(N) bit-for-bit."""
    from flax import serialization

    d = os.path.join(output_dir, f"checkpoint-{step}")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(
            {"lora": jax.device_get(lora), "opt": jax.device_get(opt_state)}))
    meta = {"step": step,
            "jax_rng": np.asarray(jax.device_get(rng)).tolist(),
            "host_rng": host_rng.bit_generator.state}
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f)
    return d


def latest_lora_checkpoint(output_dir: str) -> Optional[str]:
    """Most recent `checkpoint-*` dir (reference 'latest' resolution
    :895-899); None when there is none."""
    if not os.path.isdir(output_dir):
        return None
    dirs = [d for d in os.listdir(output_dir) if d.startswith("checkpoint-")
            and d.split("-")[-1].isdigit()]
    if not dirs:
        return None
    best = max(dirs, key=lambda d: int(d.split("-")[-1]))
    return os.path.join(output_dir, best)


def restore_lora_checkpoint(path: str, lora_template, opt_template):
    """Restore (lora, opt_state, jax_rng, host_rng, step) from a
    checkpoint dir; templates supply the pytree structure (from init_fn)."""
    from flax import serialization

    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        state = serialization.from_bytes(
            {"lora": lora_template, "opt": opt_template}, f.read())
    meta = json.load(open(os.path.join(path, "meta.json")))
    rng = jnp.asarray(meta["jax_rng"], jnp.uint32)
    host_rng = np.random.default_rng()
    host_rng.bit_generator.state = meta["host_rng"]
    return state["lora"], state["opt"], rng, host_rng, int(meta["step"])


def generate_class_images(mods: SDModules, embeds3, class_data_dir: str,
                          num_class_images: int, rng, *,
                          num_inference_steps: int = 50,
                          resolution: Optional[int] = None) -> int:
    """Top up `class_data_dir` to `num_class_images` prior-preservation
    class images (reference train_dreambooth...py:510-553): each is a full
    pipeline inpaint of a RANDOM image under a FULL mask — i.e. pure
    prompt-driven generation through the inpainting UNet — saved to disk.
    Uses the repo's own jitted denoise loop (guidance/pipeline.py) instead
    of a second vendored pipeline. Returns how many images were written."""
    import imageio.v2 as imageio

    from ..guidance.pipeline import inpaint

    os.makedirs(class_data_dir, exist_ok=True)
    existing = [f for f in os.listdir(class_data_dir)
                if f.endswith((".png", ".jpg", ".jpeg"))]
    n_new = num_class_images - len(existing)
    if n_new <= 0:
        return 0
    S = mods.latent_size
    gen = jax.jit(lambda up, vp, img, k: inpaint(
        mods, embeds3, img, jnp.ones((S, S)), k,
        num_inference_steps=num_inference_steps, unet_params=up,
        vae_params=vp))
    print(f"[lora] generating {n_new} class images → {class_data_dir}")
    for i in range(n_new):
        rng, k_img, k_gen = jax.random.split(rng, 3)
        # the reference feeds torch.rand noise as the (fully repainted)
        # init image (:539-546)
        img = jax.random.uniform(k_img, (S, S, 3))
        out = np.asarray(gen(mods.unet_params, mods.vae_params, img, k_gen))
        out8 = (np.clip(out, 0, 1) * 255).astype(np.uint8)
        if resolution and resolution != S:
            import cv2

            out8 = cv2.resize(out8, (resolution, resolution),
                              interpolation=cv2.INTER_AREA)
        imageio.imwrite(os.path.join(
            class_data_dir, f"class_{len(existing) + i:05d}.png"), out8)
    return n_new


def train_lora(mods: SDModules, dataset: DreamBoothInpaintDataset,
               encode_prompt, *, steps: int = 2000, batch_size: int = 4,
               rank: int = 32, lr: float = 1e-4, seed: int = 0,
               output_dir: str = "./lora_out",
               checkpointing_steps: int = 500, masked_loss: bool = False,
               log_every: int = 50, mesh=None,
               class_dataset: Optional[DreamBoothInpaintDataset] = None,
               prior_loss_weight: float = 1.0,
               text_tower=None, tokenize=None, text_rank: int = 4,
               resume_from: Optional[str] = None):
    """Run the LoRA fine-tune loop; saves safetensors + resumable ckpts.

    class_dataset: enables prior preservation — every step samples a class
    batch of the same size and the loss adds prior_loss_weight · class-MSE
    (reference two-term loss :985-999).
    text_tower/tokenize: (module, params) + caption→ids fn — trains rank-4
    text-encoder adapters jointly (reference --train_text_encoder).
    resume_from: 'latest' or a checkpoint dir path.
    """
    os.makedirs(output_dir, exist_ok=True)
    if mesh is None and jax.device_count() > 1:
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        print(f"[lora] data-parallel over {jax.device_count()} devices")
    if text_tower is not None and tokenize is None:
        raise ValueError("text_tower requires a tokenize fn "
                         "(captions → input_ids)")
    import inspect

    _accepts_rng = "rng" in inspect.signature(encode_prompt).parameters
    init_fn, step = make_lora_train_step(
        mods, rank=rank, lr=lr, masked_loss=masked_loss, mesh=mesh,
        prior_preservation=class_dataset is not None,
        prior_loss_weight=prior_loss_weight,
        text_tower=text_tower, text_rank=text_rank)
    lora, opt_state = init_fn(jax.random.PRNGKey(seed))
    print(f"[lora] training {lora_param_count(lora):,} adapter params")

    host_rng = np.random.default_rng(seed)
    rng = jax.random.PRNGKey(seed + 1)
    start = 0
    if resume_from:
        path = (latest_lora_checkpoint(output_dir)
                if resume_from == "latest" else resume_from)
        if path and os.path.isdir(path):
            lora, opt_state, rng, host_rng, start = restore_lora_checkpoint(
                path, lora, opt_state)
            print(f"[lora] resumed from {path} at step {start}")
        else:
            print(f"[lora] resume checkpoint '{resume_from}' not found; "
                  f"starting fresh")

    t0 = time.time()
    for i in range(start + 1, steps + 1):
        imgs, masks, captions, imasks = dataset.batch(host_rng, batch_size)
        if class_dataset is not None:
            # [instance ‖ class] halves on the leading axis; the class half
            # is never instance-masked (mask weight only applies to the
            # first half inside the loss).
            cimgs, cmasks, ccaps, _ = class_dataset.batch(host_rng,
                                                          batch_size)
            imgs = np.concatenate([imgs, cimgs])
            masks = np.concatenate([masks, cmasks])
            captions = captions + ccaps
            if imasks is not None:
                imasks = np.concatenate(
                    [imasks, np.zeros_like(imasks)])
        batch = {"image": jnp.asarray(imgs), "mask": jnp.asarray(masks),
                 "instance_mask": (jnp.asarray(imasks)
                                   if imasks is not None else None)}
        if text_tower is not None:
            batch["input_ids"] = jnp.asarray(tokenize(captions))
        else:
            # encode_prompt may be stochastic (prior-embeds sampling in
            # train_lora.py); feeding it the CHECKPOINTED host_rng keeps
            # resume bit-exact for that draw stream too.
            batch["embeds"] = (encode_prompt(captions, rng=host_rng)
                               if _accepts_rng else encode_prompt(captions))
        rng, k = jax.random.split(rng)
        lora, opt_state, m = step(lora, opt_state, batch, k)
        if i % log_every == 0:
            print(f"[lora {i}/{steps}] loss={float(m['loss']):.4f} "
                  f"({log_every / (time.time() - t0):.1f} it/s)")
            t0 = time.time()
        if i % checkpointing_steps == 0 or i == steps:
            p = os.path.join(output_dir, f"lora_{i:06d}.safetensors")
            save_lora(jax.device_get(lora), p)
            save_lora_checkpoint(output_dir, i, lora, opt_state, rng,
                                 host_rng)
            print(f"[lora] saved {p} (+ checkpoint-{i})")
    return lora
