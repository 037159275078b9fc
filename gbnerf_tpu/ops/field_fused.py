"""Fused CP-field Pallas TPU kernel: grid encode + σ/color MLPs, one pass.

Replaces the XLA chain encode → HBM → σ-net → HBM → color-net for the
flagship CP field (core/cp_field.py). Measured on v5e at SD workload shapes
(TILE=4096): 354 M pts/s fused (σ-only coarse variant 382) vs 177 M pts/s
for the XLA chain, 2x (tools/exp_kernels.py; a two-hot + difference-line
variant lost to the doubled matmul width and was rejected).

Two layout decisions carry the win:

1. **[features, points] layout everywhere.** The triangle weight matrix is
   generated as [r_max (sublanes), TILE (lanes)] — ~1.45x fewer padded vreg
   elements than the [TILE, r_max] orientation (257 pads to 264 sublanes
   instead of 384 lanes) — and every contraction is a standard [M,K]@[K,N]
   matmul with (transposed) weights as lhs, so Mosaic emits no relayouts.
2. **No intermediate leaves VMEM.** Weights, encodings and hidden
   activations live per-tile in VMEM; HBM traffic is points+SH in, raw out.

Backward runs the identical-topology XLA oracle through jax.vjp
(custom_vjp), so training works unchanged; on non-TPU backends the oracle
is also the forward (CPU tests, driver dryruns).

Parity: this implements the tcnn-field head topology of the reference
(run_nerf_helpers_tcnn.py:13-117) on the CP grid encode; see
core/cp_field.py for the encode math.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 4096  # v5e sweep: 289 M pts/s @1024, 339 @2048, 354 @4096 (full)

# Ws dict keys, Dense-style [in, out] orientation.
W_KEYS = ("ws0", "ws1", "wc0", "wc1", "wc2")


def heads_apply(enc, sh, Ws, *, sigma_only: bool = False):
    """σ/color MLP heads on an encoding — XLA oracle, [points, features].

    Mirrors the kernel exactly: bf16 operands, f32 accumulation, relu in
    f32. Returns raw [..., 4] (rgb logits ⊕ σ); rgb is zero when sigma_only.
    """

    def dot(h, w):
        return jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    h = jax.nn.relu(dot(enc, Ws["ws0"]))
    h = dot(h, Ws["ws1"])                       # [..., 16]
    sigma = h[..., :1]
    if sigma_only:
        return jnp.concatenate([jnp.zeros(sigma.shape[:-1] + (3,), sigma.dtype),
                                sigma], axis=-1)
    hc = jnp.concatenate([sh.astype(jnp.float32), h[..., 1:]], axis=-1)
    h = jax.nn.relu(dot(hc, Ws["wc0"]))
    h = jax.nn.relu(dot(h, Ws["wc1"]))
    rgb = dot(h, Ws["wc2"])
    return jnp.concatenate([rgb, sigma], axis=-1)


def encode_oracle(x01, ulines):
    """Unified triangle-kernel CP encode — XLA oracle, [points, features]."""
    r_max = ulines.shape[1]
    pos = jnp.arange(r_max, dtype=jnp.float32)
    prod = None
    for axis in range(3):
        u = jnp.clip(x01[..., axis], 0.0, 1.0) * (r_max - 1)
        w = jnp.maximum(1.0 - jnp.abs(pos - u[..., None]), 0.0)
        fa = jnp.dot(w.astype(jnp.bfloat16),
                     ulines[axis].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        prod = fa if prod is None else prod * fa
    return prod


def _oracle(x01, sh, ulines, Ws, *, sigma_only: bool):
    return heads_apply(encode_oracle(x01, ulines), sh, Ws,
                       sigma_only=sigma_only)


def _encode_split(x_ref, lt_ref, r_max: int, tile: int):
    """Triangle-mask CP encode over two lane halves: [F, tile] product.

    Generating masks at [r_max, tile/2] and interleaving mask-gen (VPU)
    with the encode matmuls (MXU) of the other half lets Mosaic co-issue
    the two ports — measured ~7% over the whole-tile order at TILE=4096
    (tools/exp_mask.py v3; masks-first and MXU-diff variants lost).
    Pure reordering: values are bit-identical to the whole-tile kernel.
    """
    half = tile // 2
    pos = jax.lax.broadcasted_iota(
        jnp.int32, (r_max, half), 0).astype(jnp.float32)

    def mask(axis, lo):
        u = jnp.clip(x_ref[axis, lo:lo + half], 0.0, 1.0) * (r_max - 1)
        return jnp.maximum(1.0 - jnp.abs(pos - u[None, :]),
                           0.0).astype(jnp.bfloat16)

    outs = []
    for lo in (0, half):
        prod = None
        for axis in range(3):
            fa = jnp.dot(lt_ref[axis], mask(axis, lo),
                         preferred_element_type=jnp.float32)  # [F, half]
            prod = fa if prod is None else prod * fa
        outs.append(prod)
    return jnp.concatenate(outs, axis=1)


def _kernel(x_ref, sh_ref, lt_ref, ws0_ref, ws1_ref, wc0_ref, wc1_ref,
            wc2_ref, out_ref, *, r_max: int, sigma_only: bool):
    tile = x_ref.shape[1]
    prod = _encode_split(x_ref, lt_ref, r_max, tile)
    h = jnp.maximum(jnp.dot(ws0_ref[:], prod.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32), 0.0)
    h = jnp.dot(ws1_ref[:], h.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)        # [16, tile]
    sigma = h[:1, :]
    if sigma_only:
        out_ref[:] = jnp.concatenate(
            [jnp.zeros((3, tile), jnp.float32), sigma], axis=0)
        return
    hc = jnp.concatenate([sh_ref[:], h[1:, :].astype(jnp.bfloat16)], axis=0)
    h = jnp.maximum(jnp.dot(wc0_ref[:], hc,
                            preferred_element_type=jnp.float32), 0.0)
    h = jnp.maximum(jnp.dot(wc1_ref[:], h.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32), 0.0)
    rgb = jnp.dot(wc2_ref[:], h.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)      # [3, tile]
    out_ref[:] = jnp.concatenate([rgb, sigma], axis=0)


def _pallas_fwd(x01, sh, ulines, Ws, *, sigma_only: bool):
    n = x01.shape[0]
    r_max, feat = ulines.shape[1], ulines.shape[2]
    ntiles = -(-n // TILE)
    pad = ntiles * TILE - n
    x_t = jnp.pad(x01, ((0, pad), (0, 0))).T                 # [3, n']
    sh_t = jnp.pad(sh, ((0, pad), (0, 0))).T.astype(jnp.bfloat16)  # [16, n']
    lt = jnp.transpose(ulines, (0, 2, 1)).astype(jnp.bfloat16)     # [3, F, R]
    wt = {k: Ws[k].T.astype(jnp.bfloat16) for k in W_KEYS}   # [out, in]

    const = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_kernel, r_max=r_max, sigma_only=sigma_only),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((sh.shape[1], TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, feat, r_max), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wt["ws0"].shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wt["ws1"].shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wt["wc0"].shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wt["wc1"].shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wt["wc2"].shape, const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, ntiles * TILE), jnp.float32),
    )(x_t, sh_t, lt, wt["ws0"], wt["ws1"], wt["wc0"], wt["wc1"], wt["wc2"])
    out = out.T
    return out[:n] if pad else out


def _dispatch(sigma_only, x01, sh, ulines, ws0, ws1, wc0, wc1, wc2):
    Ws = dict(zip(W_KEYS, (ws0, ws1, wc0, wc1, wc2)))
    if jax.default_backend() == "tpu":
        return _pallas_fwd(x01, sh, ulines, Ws, sigma_only=sigma_only)
    return _oracle(x01, sh, ulines, Ws, sigma_only=sigma_only)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _apply(sigma_only, x01, sh, ulines, ws0, ws1, wc0, wc1, wc2):
    return _dispatch(sigma_only, x01, sh, ulines, ws0, ws1, wc0, wc1, wc2)


def _apply_fwd(sigma_only, x01, sh, ulines, ws0, ws1, wc0, wc1, wc2):
    out = _dispatch(sigma_only, x01, sh, ulines, ws0, ws1, wc0, wc1, wc2)
    return out, (x01, sh, ulines, ws0, ws1, wc0, wc1, wc2)


def _apply_bwd(sigma_only, res, g):
    x01, sh, ulines, ws0, ws1, wc0, wc1, wc2 = res
    # plain re-linearization through the XLA oracle
    _, vjp = jax.vjp(
        lambda x, s, ul, a, b, c, d, e: _oracle(
            x, s, ul, dict(zip(W_KEYS, (a, b, c, d, e))),
            sigma_only=sigma_only),
        x01, sh, ulines, ws0, ws1, wc0, wc1, wc2)
    return vjp(g)


_apply.defvjp(_apply_fwd, _apply_bwd)


def cp_field_fused(x01, sh, ulines, Ws, *, sigma_only: bool = False):
    """Fused CP-field forward: points+SH → raw [N, 4] (rgb logits ⊕ σ).

    Args:
      x01: [N, 3] points in [0, 1]^3.
      sh: [N, sh_dim] per-point SH direction encoding (may be a dummy
        1-wide array when sigma_only — it is neither read nor transferred).
      ulines: [3, R_max, F] unified (upsampled) CP lines, f32.
      Ws: dict of head kernels, Dense orientation [in, out]:
        ws0 [F, 64], ws1 [64, 1+geo], wc0 [sh_dim+geo, 64], wc1 [64, 64],
        wc2 [64, 3].
    """
    if sigma_only:
        # SH never enters the σ path; route through the sh-free wrapper so
        # the unused [N, sh_dim] operand isn't transposed/transferred.
        return _apply_sigma(x01, ulines, Ws["ws0"], Ws["ws1"])
    return _apply(sigma_only, x01, sh, ulines, *(Ws[k] for k in W_KEYS))


def _kernel_sigma(x_ref, lt_ref, ws0_ref, ws1_ref, out_ref, *, r_max: int):
    tile = x_ref.shape[1]
    prod = _encode_split(x_ref, lt_ref, r_max, tile)
    h = jnp.maximum(jnp.dot(ws0_ref[:], prod.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32), 0.0)
    h = jnp.dot(ws1_ref[:], h.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    out_ref[:] = jnp.concatenate(
        [jnp.zeros((3, tile), jnp.float32), h[:1, :]], axis=0)


def _pallas_fwd_sigma(x01, ulines, ws0, ws1):
    n = x01.shape[0]
    r_max, feat = ulines.shape[1], ulines.shape[2]
    ntiles = -(-n // TILE)
    pad = ntiles * TILE - n
    x_t = jnp.pad(x01, ((0, pad), (0, 0))).T
    lt = jnp.transpose(ulines, (0, 2, 1)).astype(jnp.bfloat16)
    w0t = ws0.T.astype(jnp.bfloat16)
    w1t = ws1.T.astype(jnp.bfloat16)
    const = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_kernel_sigma, r_max=r_max),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, feat, r_max), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w0t.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1t.shape, const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, ntiles * TILE), jnp.float32),
    )(x_t, lt, w0t, w1t)
    out = out.T
    return out[:n] if pad else out


def _dispatch_sigma(x01, ulines, ws0, ws1):
    if jax.default_backend() == "tpu":
        return _pallas_fwd_sigma(x01, ulines, ws0, ws1)
    dummy_sh = jnp.zeros((x01.shape[0], 1), x01.dtype)
    Ws = {"ws0": ws0, "ws1": ws1, "wc0": None, "wc1": None, "wc2": None}
    return heads_apply(encode_oracle(x01, ulines), dummy_sh, Ws,
                       sigma_only=True)


@jax.custom_vjp
def _apply_sigma(x01, ulines, ws0, ws1):
    return _dispatch_sigma(x01, ulines, ws0, ws1)


def _apply_sigma_fwd(x01, ulines, ws0, ws1):
    return _dispatch_sigma(x01, ulines, ws0, ws1), (x01, ulines, ws0, ws1)


def _apply_sigma_bwd(res, g):
    x01, ulines, ws0, ws1 = res

    def oracle(x, ul, a, b):
        dummy_sh = jnp.zeros((x.shape[0], 1), x.dtype)
        return heads_apply(encode_oracle(x, ul), dummy_sh,
                           {"ws0": a, "ws1": b, "wc0": None, "wc1": None,
                            "wc2": None}, sigma_only=True)

    _, vjp = jax.vjp(oracle, x01, ulines, ws0, ws1)
    return vjp(g)


_apply_sigma.defvjp(_apply_sigma_fwd, _apply_sigma_bwd)
