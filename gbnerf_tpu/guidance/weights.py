"""Checkpoint conversion: diffusers/transformers torch weights → flax params.

The reference loads `runwayml/stable-diffusion-inpainting` + a PEFT-LoRA
checkpoint (sd_utils.py:93-100). This environment has no network access, so
conversion runs against a LOCAL diffusers-layout directory:

    <dir>/unet/diffusion_pytorch_model.{safetensors,bin}
    <dir>/vae/diffusion_pytorch_model.{safetensors,bin}
    <dir>/text_encoder/model.{safetensors,bin}
    <dir>/tokenizer/...

Mapping strategy: our flax module names intentionally mirror diffusers'
module paths, so torch keys transform by regex (down_blocks.0.resnets.1 →
down_0_resnets_1, to_out.0 → to_out_0, ff.net.0 → ff.net_0, ...) and
parameter kind (conv kernel OIHW→HWIO, linear transpose, norm weight→scale).
Unmatched keys are reported, never silently dropped.
"""
from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp


def _load_state_dict(path_base: str) -> Optional[Dict[str, np.ndarray]]:
    for ext, loader in (
        (".safetensors", "safetensors"),
        (".bin", "torch"),
    ):
        p = path_base + ext
        if os.path.exists(p):
            if loader == "safetensors":
                from safetensors.numpy import load_file

                return {k: np.asarray(v) for k, v in load_file(p).items()}
            import torch

            sd = torch.load(p, map_location="cpu", weights_only=True)
            return {k: v.float().numpy() for k, v in sd.items()}
    return None


_UNET_RULES = [
    (r"down_blocks\.(\d+)\.resnets\.(\d+)", r"down_\1_resnets_\2"),
    (r"down_blocks\.(\d+)\.attentions\.(\d+)", r"down_\1_attentions_\2"),
    (r"down_blocks\.(\d+)\.downsamplers\.0", r"down_\1_downsamplers_0"),
    (r"up_blocks\.(\d+)\.resnets\.(\d+)", r"up_\1_resnets_\2"),
    (r"up_blocks\.(\d+)\.attentions\.(\d+)", r"up_\1_attentions_\2"),
    (r"up_blocks\.(\d+)\.upsamplers\.0", r"up_\1_upsamplers_0"),
    (r"mid_block\.resnets\.(\d+)", r"mid_resnets_\1"),
    (r"mid_block\.attentions\.(\d+)", r"mid_attentions_\1"),
    (r"transformer_blocks\.(\d+)", r"transformer_blocks_\1"),
    (r"to_out\.0", r"to_out_0"),
    (r"ff\.net\.0", r"ff.net_0"),
    (r"ff\.net\.2", r"ff.net_2"),
]

_VAE_RULES = [
    (r"(en|de)coder\.down_blocks\.(\d+)\.resnets\.(\d+)", r"\1coder.down_\2_resnets_\3"),
    (r"(en|de)coder\.down_blocks\.(\d+)\.downsamplers\.0", r"\1coder.down_\2_downsamplers_0"),
    (r"(en|de)coder\.up_blocks\.(\d+)\.resnets\.(\d+)", r"\1coder.up_\2_resnets_\3"),
    (r"(en|de)coder\.up_blocks\.(\d+)\.upsamplers\.0", r"\1coder.up_\2_upsamplers_0"),
    (r"(en|de)coder\.mid_block\.resnets\.(\d+)", r"\1coder.mid_resnets_\2"),
    (r"(en|de)coder\.mid_block\.attentions\.0", r"\1coder.mid_attentions_0"),
    (r"to_out\.0", r"to_out_0"),
    # original SD1.x VAE dumps name the mid attention query/key/value/
    # proj_attn; diffusers re-exports use to_q/to_k/to_v/to_out.0 — accept
    # both (the reference's runwayml checkpoint ships the legacy names).
    (r"mid_attentions_0\.query", r"mid_attentions_0.to_q"),
    (r"mid_attentions_0\.key", r"mid_attentions_0.to_k"),
    (r"mid_attentions_0\.value", r"mid_attentions_0.to_v"),
    (r"mid_attentions_0\.proj_attn", r"mid_attentions_0.to_out_0"),
]

_TEXT_RULES = [
    (r"text_model\.embeddings\.token_embedding", r"token_embedding"),
    (r"text_model\.embeddings\.position_embedding\.weight",
     r"position_embedding"),
    (r"text_model\.encoder\.layers\.(\d+)\.self_attn", r"layers_\1"),
    (r"text_model\.encoder\.layers\.(\d+)\.mlp", r"layers_\1"),
    (r"text_model\.encoder\.layers\.(\d+)", r"layers_\1"),
    (r"text_model\.final_layer_norm", r"final_layer_norm"),
]


def _apply_rules(key: str, rules) -> str:
    for pat, rep in rules:
        key = re.sub(pat, rep, key)
    return key


def _set_param(tree: Dict, path, value, converted, missing_shape_ok=False):
    """Place `value` at `path` if the leaf exists (shape-checked)."""
    node = tree
    for p in path[:-1]:
        if p not in node:
            return False
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        return False
    want = node[leaf].shape
    if tuple(value.shape) != tuple(want):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"ckpt {value.shape} vs model {want}")
    node[leaf] = jnp.asarray(value, node[leaf].dtype
                             if hasattr(node[leaf], "dtype") else jnp.float32)
    converted.append("/".join(path))
    return True


def convert_state_dict(sd: Dict[str, np.ndarray], params: Dict, rules,
                       *, embed_keys=()) -> Tuple[Dict, list, list]:
    """Map a torch state dict onto a (copied) flax param tree."""
    import copy

    out = copy.deepcopy(jax_tree_to_py(params))
    converted, unmatched = [], []
    for tkey, val in sd.items():
        if tkey.endswith("position_ids"):
            continue  # transformers buffer (arange), not a parameter
        fkey = _apply_rules(tkey, rules)
        parts = fkey.split(".")
        name, kind = parts[:-1], parts[-1]

        placed = False
        if fkey in embed_keys or parts[0] in embed_keys:
            # embeddings / bare params: keep orientation
            if kind == "weight":
                placed = _set_param(out, name + ["embedding"], val, converted)
            else:
                placed = _set_param(out, parts, val, converted)
        elif kind == "weight":
            if val.ndim == 4:   # conv OIHW → HWIO
                placed = _set_param(out, name + ["kernel"],
                                    val.transpose(2, 3, 1, 0), converted)
            elif val.ndim == 2:  # linear [O, I] → [I, O]
                placed = _set_param(out, name + ["kernel"], val.T, converted)
            else:               # norm scale
                placed = _set_param(out, name + ["scale"], val, converted)
        elif kind == "bias":
            placed = _set_param(out, name + ["bias"], val, converted)
        else:
            placed = _set_param(out, parts, val, converted)
        if not placed:
            unmatched.append(tkey)
    return out, converted, unmatched


def jax_tree_to_py(tree):
    if isinstance(tree, dict):
        return {k: jax_tree_to_py(v) for k, v in tree.items()}
    return tree


def count_leaves(tree) -> int:
    import jax

    return len(jax.tree_util.tree_leaves(tree))


def load_sd_weights(weights_dir: str, unet_params, vae_params, text_params,
                    *, lora_dir: Optional[str] = None, lora_rank: int = 32,
                    strict: bool = False):
    """Load a local diffusers checkpoint dir into the three param trees."""
    reports = {}

    sd = _load_state_dict(os.path.join(weights_dir, "unet",
                                       "diffusion_pytorch_model"))
    if sd is not None:
        if lora_dir:
            sd = merge_lora_state_dict(sd, lora_dir, rank=lora_rank)
        unet_params, conv, unmatched = convert_state_dict(
            sd, unet_params, _UNET_RULES)
        reports["unet"] = (len(conv), unmatched)

    sd = _load_state_dict(os.path.join(weights_dir, "vae",
                                       "diffusion_pytorch_model"))
    if sd is not None:
        vae_params, conv, unmatched = convert_state_dict(
            sd, vae_params, _VAE_RULES)
        reports["vae"] = (len(conv), unmatched)

    sd = _load_state_dict(os.path.join(weights_dir, "text_encoder", "model"))
    if sd is not None:
        text_params, conv, unmatched = convert_state_dict(
            sd, text_params, _TEXT_RULES,
            embed_keys=("token_embedding", "position_embedding"))
        reports["text"] = (len(conv), unmatched)

    for name, (n, unmatched) in reports.items():
        msg = f"[weights] {name}: {n} tensors loaded, {len(unmatched)} unmatched"
        print(msg)
        if unmatched[:5]:
            print(f"[weights]   e.g. {unmatched[:5]}")
        if strict and unmatched:
            raise ValueError(msg)
    return unet_params, vae_params, text_params


def merge_lora_state_dict(base_sd: Dict[str, np.ndarray], lora_dir: str,
                          *, rank: int = 32,
                          alpha: Optional[float] = None) -> Dict[str, np.ndarray]:
    """Merge a PEFT-LoRA checkpoint into base torch weights:
    W ← W + (α/r)·B@A (the reference trains rank/α 32 → scale 1,
    train_dreambooth...py:631-652)."""
    lora = None
    for name in ("adapter_model", "pytorch_lora_weights"):
        lora = _load_state_dict(os.path.join(lora_dir, name))
        if lora is not None:
            break
    if lora is None:
        print(f"[weights] no LoRA checkpoint found under {lora_dir}")
        return base_sd

    scale = (alpha or rank) / rank
    merged = dict(base_sd)
    n = 0
    for key, a_val in lora.items():
        if "lora_A" not in key and "lora_down" not in key:
            continue
        b_key = key.replace("lora_A", "lora_B").replace("lora_down", "lora_up")
        base_key = (key
                    .replace("base_model.model.", "")
                    .replace(".lora_A.weight", ".weight")
                    .replace(".lora_down.weight", ".weight")
                    .replace("unet.", "", 1 if key.startswith("unet.") else 0))
        if b_key not in lora or base_key not in merged:
            continue
        A, B = a_val, lora[b_key]
        W = merged[base_key]
        if W.ndim == 4:  # conv: [O,I,kh,kw]; LoRA A [r, I*kh*kw] or [r,I,kh,kw]
            delta = (B.reshape(B.shape[0], -1) @ A.reshape(A.shape[0], -1))
            delta = delta.reshape(W.shape)
        else:
            delta = B @ A
        merged[base_key] = W + scale * delta.astype(W.dtype)
        n += 1
    print(f"[weights] merged {n} LoRA deltas (scale {scale})")
    return merged


def save_prior_ckpt(path: str, mods) -> None:
    """Serialize a self-trained prior (tools/train_tiny_prior.py) — the
    weights-free analog of the reference's LoRA scene prior (SURVEY.md L6):
    UNet/VAE params plus the prompt embeddings computed by the training
    process's text tower (embeddings ship IN the ckpt so the consumer does
    not depend on matching the trainer's text-init seed)."""
    from flax import serialization

    payload = {"unet": mods.unet_params, "vae": mods.vae_params,
               "embeds_rgb": mods.embeds_rgb,
               "embeds_normal": mods.embeds_normal}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_prior_ckpt(path: str, mods):
    """Restore a prior ckpt over freshly-initialized SDModules (shapes must
    match — same UNet/VAE config + latent size as the trainer used).
    Returns the updated SDModules."""
    import dataclasses

    from flax import serialization

    target = {"unet": mods.unet_params, "vae": mods.vae_params,
              "embeds_rgb": mods.embeds_rgb,
              "embeds_normal": mods.embeds_normal}
    with open(path, "rb") as f:
        restored = serialization.from_bytes(target, f.read())
    # from_bytes yields NUMPY leaves; as jit arguments those re-upload
    # host→device EVERY step (~30 MB/s tunnel → measured 185 → 1.7 it/s
    # in the ablation prior arm). Commit them to device arrays once.
    import jax

    restored = jax.tree_util.tree_map(jnp.asarray, restored)
    return dataclasses.replace(
        mods, unet_params=restored["unet"], vae_params=restored["vae"],
        embeds_rgb=restored["embeds_rgb"],
        embeds_normal=restored["embeds_normal"])
