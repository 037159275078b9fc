"""LoRA: low-rank adaptation of the SD UNet (and text encoder) in flax.

Parity with the reference's PEFT usage (train_dreambooth_inpaint_lora_
normal_caption.py:631-663): rank/α 32 adapters on attention (to_q/k/v/out),
feed-forward (ff.net_0.proj / ff.net_2) and transformer projection conv
targets; optional rank-4 text-encoder adapters.

Design: FUNCTIONAL reparametrization instead of module surgery — LoRA params
mirror the base tree at the target leaves, and ``apply_lora`` produces the
effective params W' = W + (α/r)·(A@B) inside the jitted loss. The base tree
is stop-gradiented by the caller; gradients flow only into the adapters.
This keeps every model definition untouched and works under pjit unchanged.
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# Default target patterns (leaf path joined by '/'): SD attention + FF + the
# transformer 1×1 projections, mirroring the reference LoraConfig targets.
DEFAULT_TARGETS = (
    r".*/attn[12]/to_q/kernel$",
    r".*/attn[12]/to_k/kernel$",
    r".*/attn[12]/to_v/kernel$",
    r".*/attn[12]/to_out_0/kernel$",
    r".*/ff/net_0/proj/kernel$",
    r".*/ff/net_2/kernel$",
    r".*/proj_in/kernel$",
    r".*/proj_out/kernel$",
)

TEXT_TARGETS = (
    r".*/(q_proj|k_proj|v_proj|out_proj)/kernel$",
)


def _iter_leaves(tree: Dict, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _iter_leaves(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _match(path: Tuple[str, ...], patterns) -> bool:
    s = "/".join(path)
    return any(re.match(p, s) for p in patterns)


def init_lora(rng, base_params: Dict, *, rank: int = 32,
              targets=DEFAULT_TARGETS) -> Dict:
    """Build the adapter tree: for each matching kernel W [.., I, O] create
    A [I_flat, r] (gaussian/√r) and B [r, O] (zeros — identity at init)."""
    lora: Dict = {}
    keys = jax.random.split(rng, 4096)
    ki = 0
    for path, w in _iter_leaves(base_params):
        if not _match(path, targets):
            continue
        shape = w.shape
        i_flat = int(np.prod(shape[:-1]))
        out = shape[-1]
        node = lora
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {
            "lora_A": jax.random.normal(keys[ki % len(keys)], (i_flat, rank),
                                        jnp.float32) / np.sqrt(rank),
            "lora_B": jnp.zeros((rank, out), jnp.float32),
        }
        ki += 1
    return lora


def apply_lora(base_params: Dict, lora_params: Dict, *, rank: int = 32,
               alpha: Optional[float] = None) -> Dict:
    """Effective params: W' = W + (α/r)·reshape(A@B). Jit-safe tree merge."""
    scale = (alpha if alpha is not None else rank) / rank

    def merge(base: Dict, lora: Dict) -> Dict:
        out = {}
        for k, v in base.items():
            lv = lora.get(k) if isinstance(lora, dict) else None
            if isinstance(v, dict):
                out[k] = merge(v, lv or {})
            elif isinstance(lv, dict) and "lora_A" in lv:
                delta = (lv["lora_A"] @ lv["lora_B"]).reshape(v.shape)
                out[k] = v + scale * delta.astype(v.dtype)
            else:
                out[k] = v
        return out

    return merge(base_params, lora_params)


def lora_param_count(lora_params: Dict) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(lora_params))


def save_lora(lora_params: Dict, path: str) -> None:
    """Save adapters as safetensors with peft-like flat keys."""
    from safetensors.numpy import save_file

    flat = {}
    for p, v in _iter_leaves(lora_params):
        flat[".".join(p)] = np.asarray(v)
    save_file(flat, path)


def load_lora(path: str) -> Dict:
    from safetensors.numpy import load_file

    flat = load_file(path)
    tree: Dict = {}
    for key, val in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


def split_adapters(path: str) -> Tuple[Dict, Optional[Dict]]:
    """Load a train_lora.py checkpoint → (unet_adapters, text_adapters|None).

    The trainer saves either a bare UNet adapter tree or, with
    --train_text_encoder, {"unet": ..., "text": ...} (lora_trainer.py
    init_fn). A bare UNet tree can never have top-level keys exactly
    {"unet"[, "text"]} — its roots are UNet module names — so the wrapper
    detection is unambiguous."""
    tree = load_lora(path)
    if set(tree) <= {"unet", "text"} and "unet" in tree:
        return tree["unet"], tree.get("text")
    return tree, None


def merge_lora_strict(base_params: Dict, lora_params: Dict, *,
                      alpha: Optional[float] = None,
                      what: str = "unet", source: str = "?") -> Dict:
    """apply_lora + loud failure when adapters don't fit the base tree.

    apply_lora by itself SKIPS adapter leaves whose path is absent from the
    base tree — right for training (the base tree is authoritative), wrong
    for loading a user checkpoint, where a config mismatch (tiny vs full
    stack, different width) must not silently no-op the guidance prior."""
    base_leaves = {p: v.shape for p, v in _iter_leaves(base_params)}
    lora_leaves = dict(_iter_leaves(lora_params))
    bad = []
    n = 0
    for p in lora_leaves:
        if p[-1] != "lora_A":
            continue                      # count each adapter once, via A
        tgt = p[:-1]
        if tgt not in base_leaves:
            bad.append("/".join(tgt) + " (no such param)")
            continue
        a_shape = lora_leaves[p].shape
        i_flat = int(np.prod(base_leaves[tgt][:-1]))
        if a_shape[0] != i_flat:
            bad.append(f"{'/'.join(tgt)} (lora_A rows {a_shape[0]} != "
                       f"base fan-in {i_flat})")
            continue
        b_shape = lora_leaves.get(p[:-1] + ("lora_B",))
        b_shape = None if b_shape is None else b_shape.shape
        out_w = base_leaves[tgt][-1]
        if b_shape is None or b_shape != (a_shape[1], out_w):
            bad.append(f"{'/'.join(tgt)} (lora_B {b_shape} != "
                       f"({a_shape[1]}, {out_w}))")
            continue
        n += 1
    if bad or n == 0:
        raise ValueError(
            f"LoRA checkpoint {source} does not fit the {what} it is being "
            f"loaded into ({n} adapters matched, {len(bad)} mismatched"
            + (": " + "; ".join(bad[:5]) if bad else "")
            + "). The adapters must be trained on the SAME stack config "
            "(tiny vs full, width) as the guidance run.")
    rank = None
    for p, v in _iter_leaves(lora_params):
        if p[-1] == "lora_A":
            rank = int(v.shape[1])
            break
    return apply_lora(base_params, lora_params,
                      rank=rank or 32, alpha=alpha)
