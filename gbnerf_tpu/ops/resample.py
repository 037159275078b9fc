"""Gather-free hierarchical resampling ops (TPU fast path).

The reference's native component is torchsearchsorted feeding sample_pdf
(SURVEY.md §2.1 L0); the straightforward jnp port (core/sampling.py) is the
oracle. On TPU, its `take_along_axis` gathers on 65-wide rows are
lane-misaligned and slow (~13 ms / 16k rays measured on v5e). These
implementations remove EVERY gather:

  - `sample_pdf_onehot`: the below/above bin selectors become one-hot
    vectors derived from the dense comparison matrix C[n,s,b] = (cdf_b ≤ u_s)
    (last-True / first-False positions via shifted ANDs), and the four
    gathered values become batched one-hot contractions — pure VPU compares
    plus MXU matmuls.
  - `merge_sorted_onehot`: merging two sorted z-value sets by rank
    (pos_a[i] = i + #{b_j < a_i}) with a one-hot scatter, replacing the
    O(S log² S) bitonic sort of jnp.sort on the concatenation.

Both are exact (up to fp roundoff) drop-in equivalents, property-tested
against the oracle in tests/test_ops.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _contract(onehot, values):
    """einsum('nsb,nb->ns') as a batched MXU matmul."""
    return jnp.einsum("nsb,nb->ns", onehot, values,
                      preferred_element_type=jnp.float32)


def sample_pdf_onehot(bins, weights, N_samples: int, *, det: bool = False,
                      rng=None, eps: float = 1e-5, sorted_u: bool = False):
    """Inverse-CDF importance sampling, gather-free (sample_pdf contract).

    Args:
      bins: [N, B] sorted bin positions.
      weights: [N, B-1] unnormalized interval weights.

    Returns:
      [N, N_samples] samples.
    """
    dtype = bins.dtype
    B = bins.shape[-1]
    w = weights + eps
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N,B]

    if det:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, N_samples, dtype=dtype),
                             cdf.shape[:-1] + (N_samples,))
    elif sorted_u:
        u = sorted_uniform(rng, cdf.shape[:-1] + (N_samples,), dtype)
    else:
        assert rng is not None
        u = jax.random.uniform(rng, cdf.shape[:-1] + (N_samples,), dtype=dtype)

    # C[n,s,b] = cdf[n,b] <= u[n,s]; always true at b=0 (cdf_0 = 0 ≤ u).
    C = cdf[:, None, :] <= u[..., None]                       # [N,S,B] bool
    # below = last True position (inds-1): C_b AND NOT C_{b+1} (False-padded).
    c_next = jnp.concatenate(
        [C[..., 1:], jnp.zeros_like(C[..., :1])], axis=-1)
    oh_below = jnp.logical_and(C, jnp.logical_not(c_next))
    # above = min(inds, B-1): NOT C_b AND C_{b-1} (True-padded), with the
    # all-True row falling back to the last bin.
    c_prev = jnp.concatenate(
        [jnp.ones_like(C[..., :1]), C[..., :-1]], axis=-1)
    oh_above = jnp.logical_and(jnp.logical_not(C), c_prev)
    all_true = C[..., -1:]
    oh_above = jnp.logical_or(
        oh_above,
        jnp.concatenate([jnp.zeros_like(C[..., :-1]), all_true], axis=-1))

    f_below = oh_below.astype(dtype)
    f_above = oh_above.astype(dtype)
    cdf_b = _contract(f_below, cdf)
    cdf_a = _contract(f_above, cdf)
    bins_b = _contract(f_below, bins)
    bins_a = _contract(f_above, bins)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def sorted_uniform(rng, shape, dtype=jnp.float32):
    """Draw per-row SORTED uniforms directly (no sort): order statistics via
    normalized cumulative sums of exponential gaps — u_(i) = S_i / S_{n+1},
    S_k = Σ_{j≤k} E_j, E_j ~ Exp(1). Distributionally identical to sorting
    iid U(0,1) draws; keeps the whole fine-sampling path sort-free."""
    n = shape[-1]
    e = jax.random.exponential(rng, shape[:-1] + (n + 1,), dtype)
    s = jnp.cumsum(e, axis=-1)
    return s[..., :-1] / s[..., -1:]


def merge_sorted_onehot(a, b):
    """Merge two per-row sorted arrays into one sorted array, gather-free.

    Args:
      a: [N, A] sorted ascending; b: [N, B] sorted ascending.
    Returns:
      [N, A+B] sorted union (stable: ties place a's entries first).

    Rank trick: a_i lands at i + #{j : b_j < a_i}; b_j lands at
    j + #{i : a_i <= b_j}. Positions become one-hot rows contracted against
    the values — compares (VPU) + matmuls (MXU), no sort network.
    """
    A, B = a.shape[-1], b.shape[-1]
    S = A + B
    # ranks
    pos_a = jnp.arange(A) + jnp.sum(
        (b[:, None, :] < a[:, :, None]).astype(jnp.int32), axis=-1)  # [N,A]
    pos_b = jnp.arange(B) + jnp.sum(
        (a[:, None, :] <= b[:, :, None]).astype(jnp.int32), axis=-1)  # [N,B]
    slots = jnp.arange(S)
    oh_a = (pos_a[..., None] == slots).astype(a.dtype)      # [N,A,S]
    oh_b = (pos_b[..., None] == slots).astype(b.dtype)      # [N,B,S]
    merged = (jnp.einsum("nas,na->ns", oh_a, a,
                         preferred_element_type=jnp.float32)
              + jnp.einsum("nbs,nb->ns", oh_b, b,
                           preferred_element_type=jnp.float32))
    return merged.astype(a.dtype)
