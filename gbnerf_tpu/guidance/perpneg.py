"""Perp-Neg: perpendicular-component aggregation of directional noise deltas.

Parity with weighted_perpendicular_aggregator
(/root/reference/DS_NeRF/guidance/perpneg_utils.py:17-48): for each auxiliary
delta ε_i (vs the main text delta ε_main), remove its component parallel to
ε_main and accumulate the weighted perpendicular residue.
"""
from __future__ import annotations

import jax.numpy as jnp


def get_perpendicular_component(x, y):
    """Component of x perpendicular to y (per batch element)."""
    proj = (jnp.sum(x * y, axis=tuple(range(1, x.ndim)), keepdims=True)
            / jnp.maximum(
                jnp.sum(y * y, axis=tuple(range(1, y.ndim)), keepdims=True),
                1e-12))
    return x - proj * y


def weighted_perpendicular_aggregator(delta_noise_preds, weights, batch_size):
    """Aggregate [(K+1)·B, ...] directional deltas into [B, ...].

    delta_noise_preds[:B] is the main direction; the remaining K·B are
    auxiliary directions whose perpendicular components are summed with
    `weights` ([K·B]).
    """
    main = delta_noise_preds[:batch_size]
    accum = main
    K = delta_noise_preds.shape[0] // batch_size - 1
    for i in range(K):
        aux = delta_noise_preds[(i + 1) * batch_size:(i + 2) * batch_size]
        w = weights[i * batch_size:(i + 1) * batch_size]
        w = w.reshape((batch_size,) + (1,) * (aux.ndim - 1))
        accum = accum + w * get_perpendicular_component(aux, main)
    return accum
