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

Backward on TPU is a second Pallas kernel (_kernel_bwd / _kernel_bwd_sigma)
that recomputes the forward per tile in VMEM and emits all eight cotangents
in one pass — the XLA-oracle re-linearization it replaces re-materialized
the [N, R] triangle masks and activations through HBM (0.92 ms slice +
0.55 ms pad signature in the stage-1 train step). Set BWD_KERNEL = False to
fall back to the oracle vjp; non-TPU backends always use the oracle (both
directions), which keeps CPU tests and driver dryruns on plain XLA.

Parity: this implements the tcnn-field head topology of the reference
(run_nerf_helpers_tcnn.py:13-117) on the CP grid encode; see
core/cp_field.py for the encode math.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 4096  # v5e sweep: 289 M pts/s @1024, 339 @2048, 354 @4096 (full)
TILE_BWD = 2048  # bwd live set is ~3x fwd's; 2048 stays inside scoped VMEM
# Kill switch: 0 routes the backward through the XLA oracle (A/B: run the
# same config with GBNERF_BWD_KERNEL=0 to measure the kernel's step win).
BWD_KERNEL = os.environ.get("GBNERF_BWD_KERNEL", "1") != "0"
# Tests set True to route the TPU kernel path (fwd+bwd) through the Pallas
# interpreter on CPU — exercises the real dispatch + custom_vjp plumbing.
INTERPRET = False


def _use_kernels() -> bool:
    return INTERPRET or jax.default_backend() == "tpu"

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
        interpret=INTERPRET,
    )(x_t, sh_t, lt, wt["ws0"], wt["ws1"], wt["wc0"], wt["wc1"], wt["wc2"])
    out = out.T
    return out[:n] if pad else out


def _dispatch(sigma_only, x01, sh, ulines, ws0, ws1, wc0, wc1, wc2):
    Ws = dict(zip(W_KEYS, (ws0, ws1, wc0, wc1, wc2)))
    if _use_kernels():
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
    if BWD_KERNEL and _use_kernels():
        Ws = dict(zip(W_KEYS, (ws0, ws1, wc0, wc1, wc2)))
        dx, dsh, dul, dWs = _pallas_bwd(x01, sh, ulines, Ws, g,
                                        sigma_only=sigma_only,
                                        interpret=INTERPRET)
        if dsh is None:   # sigma_only: sh never enters the sigma path
            dsh = jnp.zeros_like(sh)
        return (dx, dsh, dul) + tuple(dWs[k] for k in W_KEYS)
    # re-linearization through the XLA oracle (CPU backends / kill switch)
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
        interpret=INTERPRET,
    )(x_t, lt, w0t, w1t)
    out = out.T
    return out[:n] if pad else out


def _dispatch_sigma(x01, ulines, ws0, ws1):
    if _use_kernels():
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
    if BWD_KERNEL and _use_kernels():
        return _pallas_bwd_sigma(x01, ulines, ws0, ws1, g,
                                 interpret=INTERPRET)

    def oracle(x, ul, a, b):
        dummy_sh = jnp.zeros((x.shape[0], 1), x.dtype)
        return heads_apply(encode_oracle(x, ul), dummy_sh,
                           {"ws0": a, "ws1": b, "wc0": None, "wc1": None,
                            "wc2": None}, sigma_only=True)

    _, vjp = jax.vjp(oracle, x01, ulines, ws0, ws1)
    return vjp(g)


_apply_sigma.defvjp(_apply_sigma_fwd, _apply_sigma_bwd)


# ---------------------------------------------------------------------------
# Pallas backward kernel
#
# The XLA-oracle re-linearization above is correct but slow on TPU: it
# re-materializes the [N, R] triangle masks and every activation through HBM
# (its profile signature in the stage-1 train step is 0.92 ms of slice +
# 0.55 ms of pad around the grad matmuls). This kernel recomputes the
# forward per tile in VMEM and emits all eight cotangents in one pass —
# the same rematerialize-in-VMEM trade the fused forward makes.
#
# Precision matches the oracle's EFFECTIVE precision: every matmul operand
# is bf16 (the oracle's f32 cotangent operands get truncated to bf16 by the
# MXU anyway — CLAUDE.md "MXU default precision"), accumulation f32.
# Subgradient conventions at measure-zero ties (|pos−u| ∈ {0, 1}, relu(0),
# clip boundaries) follow jnp.sign/compare semantics and may differ from
# XLA's tie choices; training never sits on a tie.
# ---------------------------------------------------------------------------


def _dotT(a, b):
    """[p, T] × [q, T] → [p, q] contraction over lanes (A·Bᵀ), bf16 in."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _bwd_encode_axes(x_ref, ltT_ref, dprod, fas, r_max: int, tile: int,
                     dlt_ref):
    """Encode backward for all three axes → dx rows; accumulates dlt.

    Per axis: dfa = dprod ⊙ Π fa_other; dlt[a] += dfa·maskᵀ;
    du = Σ_R (ltᵀ·dfa) ⊙ ∂mask/∂u with ∂/∂u max(1−|pos−u|, 0) =
    sign(pos−u)·1{|pos−u|<1}; dx = du·(R−1)·1{0<x<1} (clip grad).
    """
    pos = jax.lax.broadcasted_iota(
        jnp.int32, (r_max, tile), 0).astype(jnp.float32)
    rows = []
    for axis in range(3):
        o1, o2 = (a for a in range(3) if a != axis)
        dfa = (dprod * fas[o1] * fas[o2]).astype(jnp.bfloat16)   # [F, T]
        x = x_ref[axis, :]
        u = jnp.clip(x, 0.0, 1.0) * (r_max - 1)
        d = pos - u[None, :]
        absd = jnp.abs(d)
        m = jnp.maximum(1.0 - absd, 0.0).astype(jnp.bfloat16)
        dlt_ref[axis] += _dotT(dfa, m)                           # [F, R]
        dmask = jnp.dot(ltT_ref[axis], dfa,
                        preferred_element_type=jnp.float32)      # [R, T]
        s = jnp.sign(d) * (absd < 1.0).astype(jnp.float32)
        du = jnp.sum(dmask * s, axis=0, keepdims=True)           # [1, T]
        in01 = ((x > 0.0) & (x < 1.0)).astype(jnp.float32)
        rows.append(du * ((r_max - 1) * in01[None, :]))
    return jnp.concatenate(rows, axis=0)                         # [3, T]


def _kernel_bwd(x_ref, sh_ref, g_ref, lt_ref, ltT_ref,
                ws0_ref, ws1_ref, wc0_ref, wc1_ref,
                ws0T_ref, ws1T_ref, wc0T_ref, wc1T_ref, wc2T_ref,
                dx_ref, dsh_ref, dlt_ref, dws0_ref, dws1_ref,
                dwc0_ref, dwc1_ref, dwc2_ref, *, r_max: int):
    tile = x_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dlt_ref, dws0_ref, dws1_ref, dwc0_ref, dwc1_ref,
                    dwc2_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    # ---- forward recompute (identical ops to _kernel; all live in VMEM)
    fas = []
    pos = jax.lax.broadcasted_iota(
        jnp.int32, (r_max, tile), 0).astype(jnp.float32)
    for axis in range(3):
        u = jnp.clip(x_ref[axis, :], 0.0, 1.0) * (r_max - 1)
        m = jnp.maximum(1.0 - jnp.abs(pos - u[None, :]),
                        0.0).astype(jnp.bfloat16)
        fas.append(jnp.dot(lt_ref[axis], m,
                           preferred_element_type=jnp.float32))  # [F, T]
    prod = fas[0] * fas[1] * fas[2]
    h0 = jnp.maximum(jnp.dot(ws0_ref[:], prod.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32), 0.0)
    h1 = jnp.dot(ws1_ref[:], h0.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)             # [16, T]
    hc = jnp.concatenate([sh_ref[:], h1[1:, :].astype(jnp.bfloat16)], axis=0)
    h2 = jnp.maximum(jnp.dot(wc0_ref[:], hc,
                             preferred_element_type=jnp.float32), 0.0)
    h3 = jnp.maximum(jnp.dot(wc1_ref[:], h2.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32), 0.0)

    # ---- head backward
    grgb = g_ref[:3, :]
    gsig = g_ref[3:4, :]
    dh3 = jnp.dot(wc2T_ref[:], grgb.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) * (h3 > 0.0)
    dwc2_ref[...] += _dotT(grgb, h3)
    dh2 = jnp.dot(wc1T_ref[:], dh3.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) * (h2 > 0.0)
    dwc1_ref[...] += _dotT(dh3, h2)
    dhc = jnp.dot(wc0T_ref[:], dh2.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)            # [31, T]
    dwc0_ref[...] += _dotT(dh2, hc)
    n_sh = sh_ref.shape[0]
    dsh_ref[...] = dhc[:n_sh, :]
    dh1 = jnp.concatenate([gsig, dhc[n_sh:, :]], axis=0)         # [16, T]
    dh0 = jnp.dot(ws1T_ref[:], dh1.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) * (h0 > 0.0)
    dws1_ref[...] += _dotT(dh1, h0)
    dprod = jnp.dot(ws0T_ref[:], dh0.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)          # [F, T]
    dws0_ref[...] += _dotT(dh0, prod)

    dx_ref[...] = _bwd_encode_axes(x_ref, ltT_ref, dprod, fas, r_max, tile,
                                   dlt_ref)


def _kernel_bwd_sigma(x_ref, g_ref, lt_ref, ltT_ref, ws0_ref,
                      ws0T_ref, ws1T_ref,
                      dx_ref, dlt_ref, dws0_ref, dws1_ref, *, r_max: int):
    tile = x_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dlt_ref, dws0_ref, dws1_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    fas = []
    pos = jax.lax.broadcasted_iota(
        jnp.int32, (r_max, tile), 0).astype(jnp.float32)
    for axis in range(3):
        u = jnp.clip(x_ref[axis, :], 0.0, 1.0) * (r_max - 1)
        m = jnp.maximum(1.0 - jnp.abs(pos - u[None, :]),
                        0.0).astype(jnp.bfloat16)
        fas.append(jnp.dot(lt_ref[axis], m,
                           preferred_element_type=jnp.float32))
    prod = fas[0] * fas[1] * fas[2]
    h0 = jnp.maximum(jnp.dot(ws0_ref[:], prod.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32), 0.0)

    # only σ (row 0 of h1) carries a cotangent; rgb rows are constant zeros
    gsig = g_ref[3:4, :]
    n_h1 = ws1T_ref.shape[1]
    dh1 = jnp.concatenate(
        [gsig, jnp.zeros((n_h1 - 1, tile), jnp.float32)], axis=0)
    dh0 = jnp.dot(ws1T_ref[:], dh1.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) * (h0 > 0.0)
    dws1_ref[...] += _dotT(dh1, h0)
    dprod = jnp.dot(ws0T_ref[:], dh0.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    dws0_ref[...] += _dotT(dh0, prod)

    dx_ref[...] = _bwd_encode_axes(x_ref, ltT_ref, dprod, fas, r_max, tile,
                                   dlt_ref)


def _bwd_operands(x01, ulines, g, tile: int):
    """Shared host-side packing: pad+transpose points/cotangent, lines."""
    n = x01.shape[0]
    ntiles = -(-n // tile)
    pad = ntiles * tile - n
    x_t = jnp.pad(x01, ((0, pad), (0, 0))).T                    # [3, n']
    # zero-padded cotangent: padded points contribute nothing to any grad
    g_t = jnp.pad(g, ((0, pad), (0, 0))).T                      # [4, n']
    lt = jnp.transpose(ulines, (0, 2, 1)).astype(jnp.bfloat16)  # [3, F, R]
    ltT = ulines.astype(jnp.bfloat16)                           # [3, R, F]
    return x_t, g_t, lt, ltT, ntiles, pad


def _pallas_bwd(x01, sh, ulines, Ws, g, *, sigma_only: bool,
                interpret: bool = False, tile: int | None = None):
    """All eight cotangents of the fused field in one Pallas pass.

    Returns (dx [N,3], dsh [N,S] | None, dulines [3,R,F],
    {k: dW in Dense [in,out] orientation}).
    """
    if sigma_only:
        dx, dul, dws0, dws1 = _pallas_bwd_sigma(
            x01, ulines, Ws["ws0"], Ws["ws1"], g, interpret=interpret,
            tile=tile)
        return dx, None, dul, {"ws0": dws0, "ws1": dws1}
    n = x01.shape[0]
    r_max, feat = ulines.shape[1], ulines.shape[2]
    tile = tile or TILE_BWD
    x_t, g_t, lt, ltT, ntiles, pad = _bwd_operands(x01, ulines, g, tile)
    sh_t = jnp.pad(sh, ((0, pad), (0, 0))).T.astype(jnp.bfloat16)
    wt = {k: Ws[k].T.astype(jnp.bfloat16) for k in W_KEYS}      # [out, in]
    wo = {k: Ws[k].astype(jnp.bfloat16) for k in W_KEYS}        # [in, out]
    n_sh = sh.shape[1]

    blk = lambda shape: pl.BlockSpec(shape, lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    cst = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                 memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel_bwd, r_max=r_max),
        grid=(ntiles,),
        in_specs=[blk((3, tile)), blk((n_sh, tile)), blk((4, tile)),
                  cst(lt), cst(ltT),
                  cst(wt["ws0"]), cst(wt["ws1"]), cst(wt["wc0"]),
                  cst(wt["wc1"]),
                  cst(wo["ws0"]), cst(wo["ws1"]), cst(wo["wc0"]),
                  cst(wo["wc1"]), cst(wo["wc2"])],
        out_specs=(blk((3, tile)), blk((n_sh, tile)),
                   pl.BlockSpec((3, feat, r_max), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM),
                   *(pl.BlockSpec(wt[k].shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM) for k in W_KEYS)),
        out_shape=(jax.ShapeDtypeStruct((3, ntiles * tile), jnp.float32),
                   jax.ShapeDtypeStruct((n_sh, ntiles * tile), jnp.float32),
                   jax.ShapeDtypeStruct((3, feat, r_max), jnp.float32),
                   *(jax.ShapeDtypeStruct(wt[k].shape, jnp.float32)
                     for k in W_KEYS)),
        interpret=interpret,
    )(x_t, sh_t, g_t, lt, ltT, wt["ws0"], wt["ws1"], wt["wc0"], wt["wc1"],
      wo["ws0"], wo["ws1"], wo["wc0"], wo["wc1"], wo["wc2"])
    dx_t, dsh_t, dlt = outs[:3]
    dWs = {k: d.T for k, d in zip(W_KEYS, outs[3:])}
    dx = dx_t.T[:n]
    dsh = dsh_t.T[:n]
    dul = jnp.transpose(dlt, (0, 2, 1))                          # [3, R, F]
    return dx, dsh, dul, dWs


def _pallas_bwd_sigma(x01, ulines, ws0, ws1, g, *, interpret: bool = False,
                      tile: int | None = None):
    n = x01.shape[0]
    r_max, feat = ulines.shape[1], ulines.shape[2]
    tile = tile or TILE_BWD
    x_t, g_t, lt, ltT, ntiles, pad = _bwd_operands(x01, ulines, g, tile)
    w0t = ws0.T.astype(jnp.bfloat16)
    w0o = ws0.astype(jnp.bfloat16)
    w1o = ws1.astype(jnp.bfloat16)

    blk = lambda shape: pl.BlockSpec(shape, lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    cst = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                 memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel_bwd_sigma, r_max=r_max),
        grid=(ntiles,),
        in_specs=[blk((3, tile)), blk((4, tile)), cst(lt), cst(ltT),
                  cst(w0t), cst(w0o), cst(w1o)],
        out_specs=(blk((3, tile)),
                   pl.BlockSpec((3, feat, r_max), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec(w0t.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec(ws1.T.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((3, ntiles * tile), jnp.float32),
                   jax.ShapeDtypeStruct((3, feat, r_max), jnp.float32),
                   jax.ShapeDtypeStruct(w0t.shape, jnp.float32),
                   jax.ShapeDtypeStruct(ws1.T.shape, jnp.float32)),
        interpret=interpret,
    )(x_t, g_t, lt, ltT, w0t, w0o, w1o)
    dx_t, dlt, dws0_t, dws1_t = outs
    dx = dx_t.T[:n]
    dul = jnp.transpose(dlt, (0, 2, 1))
    return dx, dul, dws0_t.T, dws1_t.T
