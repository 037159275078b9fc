"""Cumulative ops along the sample axis, TPU-fast.

XLA lowers jnp.cumsum/cumprod on TPU to a reduce-window form that costs
~0.4 ms at [16k, 128] (measured, tools/exp_scan.py after subtracting the
~27 ms per-call dispatch overhead of the axon tunnel). A single triangular
matmul at precision=HIGHEST does the same reduction on the MXU ~2-4x faster
and fuses with the surrounding elementwise stream.

HIGHEST precision is load-bearing: these are value-carrying sums (CDFs,
log-transmittance) and the MXU default truncates f32 operands to bf16
(see CLAUDE.md kernel learnings). Measured parity: 4e-6 abs on cumsum,
7e-4 rel on the exp∘cumsum∘log cumprod composition.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Below this total size the XLA lowering wins (measured: the 300-iter smoke
# at [256, 32] trains 2x faster on jnp.cumprod, while the render bench at
# [16k, 128] is 3.6x faster on the matmul). Static under jit.
_MM_MIN_SIZE = 1 << 19


def _use_mm(x) -> bool:
    return jax.default_backend() == "tpu" and x.size >= _MM_MIN_SIZE


def cumsum_last(x, *, exclusive: bool = False):
    """Cumulative sum along the LAST axis; MXU matmul on TPU at large
    shapes, jnp elsewhere.

    exclusive=True returns [0, x0, x0+x1, ...] (shifted-by-one sum).
    """
    if not _use_mm(x):
        cs = jnp.cumsum(x, axis=-1)
        if exclusive:
            cs = jnp.concatenate([jnp.zeros_like(cs[..., :1]), cs[..., :-1]],
                                 axis=-1)
        return cs
    return _cumsum_mm(x, exclusive=exclusive)


def _cumsum_mm(x, *, exclusive: bool = False):
    """Triangular-matmul cumsum (any backend; used directly in tests)."""
    s = x.shape[-1]
    k = 1 if exclusive else 0
    tri = jnp.triu(jnp.ones((s, s), x.dtype), k=k)  # tri[j,i]=1 ⇔ j ≤/< i
    return jnp.einsum("...s,st->...t", x, tri,
                      precision=jax.lax.Precision.HIGHEST)


def cumprod_last_exclusive(x, *, eps: float = 0.0):
    """Exclusive cumulative product along the last axis.

    TPU: exp∘cumsum∘log on the MXU. Elsewhere: exact jnp.cumprod of the
    reference's per-factor (x + ε). Matches T_i = Π_{j<i} (x_j + ε), T_0 = 1.

    The ε floor on the TPU path MUST be max(x, ε), not x + ε: XLA's
    algebraic simplifier reassociates (1.0 − α) + 1e-10 into
    (1.0 + 1e-10) − α, and 1.0 + 1e-10 == 1.0 in f32 — the ε folds away,
    opaque samples (α = 1) produce log(0) = −inf, and the triangular
    matmul turns −inf · 0 into NaN for the whole row. (Found by /verify:
    training NaN'd at iteration 1 on TPU while every isolated probe was
    finite — the fusion only fires in the larger jit.) max(x, ε) is
    un-foldable and differs from x + ε by ≤ ε per factor.
    """
    if not _use_mm(x):
        return jnp.cumprod(
            jnp.concatenate([jnp.ones_like(x[..., :1]), x[..., :-1] + eps],
                            axis=-1), axis=-1)
    floor = eps if eps > 0 else 1e-37
    return jnp.exp(_cumsum_mm(jnp.log(jnp.maximum(x, floor)),
                              exclusive=True))
