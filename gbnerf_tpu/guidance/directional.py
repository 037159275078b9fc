"""Directional (Perp-Neg) prompt embeddings conditioned on azimuth.

Parity with adjust_text_embeddings / get_pos_neg_text_embeddings
(/root/reference/DS_NeRF/nerf/utils.py:8-74): given per-direction prompt
embeddings {front, side, back}, blend a positive embedding by azimuth and
weight the negative directions with exponential decays; consumed by the
Perp-Neg aggregator (guidance/perpneg.py).

jit-safe reformulation: the reference branches on the azimuth value in
python; here both hemisphere cases are computed and selected with
`jnp.where`, so the whole thing traces once.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def get_pos_neg_text_embeddings(embeddings: Dict[str, jnp.ndarray],
                                azimuth_deg,
                                *, front_decay_factor: float = 2.0,
                                side_decay_factor: float = 10.0,
                                negative_w: float = -2.0):
    """Azimuth ∈ [−180, 180) → ([3, L, D] (pos, neg1, neg2), [3] weights)."""
    az = jnp.asarray(azimuth_deg, jnp.float32)
    front, side, back = (embeddings["front"], embeddings["side"],
                         embeddings["back"])

    in_front = jnp.logical_and(az >= -90.0, az < 90.0)

    # front hemisphere: blend front↔side
    r_f = jnp.where(az >= 0, 1.0 - az / 90.0, 1.0 + az / 90.0)
    pos_f = r_f * front + (1.0 - r_f) * side
    fw_f = jnp.where(r_f > 0.8, 0.0,
                     jnp.exp(-r_f * front_decay_factor) * negative_w)
    sw_f = jnp.where(r_f < 0.2, 0.0,
                     jnp.exp(-(1.0 - r_f) * side_decay_factor) * negative_w)

    # back hemisphere: blend side↔back
    r_b = jnp.where(az >= 0, 1.0 - (az - 90.0) / 90.0,
                    1.0 + (az + 90.0) / 90.0)
    pos_b = r_b * side + (1.0 - r_b) * back
    fw_b = jnp.full((), negative_w)
    sw_b = jnp.where(r_b > 0.8, 0.0,
                     jnp.exp(-r_b * side_decay_factor) * negative_w / 2.0)

    r = jnp.where(in_front, 1.0, 0.0)[..., None, None]
    pos = jnp.where(r > 0, pos_f, pos_b)
    neg1 = jnp.where(r > 0, front, side)
    neg2 = jnp.where(r > 0, side, front)
    w = jnp.where(in_front,
                  jnp.stack([jnp.ones(()), fw_f, sw_f]),
                  jnp.stack([jnp.ones(()), sw_b, fw_b]))
    return jnp.stack([pos, neg1, neg2]), w


def adjust_text_embeddings(embeddings: Dict[str, jnp.ndarray], azimuths,
                           **kw) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch version: [B] azimuths → ([3·B, L, D] interleaved embeds,
    [2·B] negative weights) for the Perp-Neg aggregator."""
    zs, ws = [], []
    for b in range(azimuths.shape[0]):
        z, w = get_pos_neg_text_embeddings(embeddings, azimuths[b], **kw)
        zs.append(z)
        ws.append(w)
    B = len(zs)
    # interleave [K=3 groups of B]
    text = jnp.concatenate(
        [jnp.stack([zs[b][i] for b in range(B)]) for i in range(3)], axis=0)
    weights = jnp.concatenate(
        [jnp.stack([ws[b][i] for b in range(B)]) for i in range(1, 3)], axis=0)
    return text, weights
