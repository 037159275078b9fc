"""Pallas backward kernel of the fused CP field vs the XLA-oracle vjp.

The kernel (ops/field_fused.py::_pallas_bwd*) recomputes the forward in
VMEM and emits all cotangents in one pass; these tests run it in interpret
mode on CPU against jax.vjp of the oracle. Both paths round matmul operands
to bf16, so agreement is tight but not bit-exact; points are drawn away
from the measure-zero subgradient ties (grid nodes, clip boundaries).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gbnerf_tpu.ops.field_fused import (
    W_KEYS, _oracle, _pallas_bwd, _pallas_bwd_sigma, heads_apply,
    encode_oracle)

R_MAX, FEAT, SH_DIM, TILE = 33, 16, 16, 256


def _mats(rng, n):
    # keep x01 off grid nodes (u integer) and off the clip boundary so the
    # oracle's and kernel's subgradient tie conventions never engage
    x01 = (0.03 + 0.94 * rng.random((n, 3))).astype(np.float32)
    u = x01 * (R_MAX - 1)
    x01 += ((np.abs(u - np.round(u)) < 1e-3) * 2e-3).astype(np.float32)
    sh = rng.standard_normal((n, SH_DIM)).astype(np.float32) * 0.5
    ulines = rng.standard_normal((3, R_MAX, FEAT)).astype(np.float32) * 0.5
    Ws = {
        "ws0": rng.standard_normal((FEAT, 64)).astype(np.float32) * 0.2,
        "ws1": rng.standard_normal((64, 16)).astype(np.float32) * 0.2,
        "wc0": rng.standard_normal((SH_DIM + 15, 64)).astype(np.float32) * 0.2,
        "wc1": rng.standard_normal((64, 64)).astype(np.float32) * 0.2,
        "wc2": rng.standard_normal((64, 3)).astype(np.float32) * 0.2,
    }
    g = rng.standard_normal((n, 4)).astype(np.float32)
    return (jnp.asarray(x01), jnp.asarray(sh), jnp.asarray(ulines),
            {k: jnp.asarray(v) for k, v in Ws.items()}, jnp.asarray(g))


def _close(a, b, name, rtol=3e-2, atol_frac=5e-3):
    # dx needs the largest slack: the oracle's dmask cotangent is bf16-
    # rounded by the cast-vjp while the kernel keeps the f32 accumulator,
    # and the Σ_R signed sum amplifies the rounding difference.
    a, b = np.asarray(a), np.asarray(b)
    atol = atol_frac * max(np.abs(b).max(), 1e-3)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=name)


@pytest.mark.parametrize("n", [256, 300])  # exact tile + ragged tail
def test_bwd_kernel_matches_oracle_full(rng, n):
    x01, sh, ulines, Ws, g = _mats(rng, n)
    _, vjp = jax.vjp(
        lambda x, s, ul, a, b, c, d, e: _oracle(
            x, s, ul, dict(zip(W_KEYS, (a, b, c, d, e))), sigma_only=False),
        x01, sh, ulines, *(Ws[k] for k in W_KEYS))
    ref = vjp(g)
    dx, dsh, dul, dWs = _pallas_bwd(x01, sh, ulines, Ws, g,
                                    sigma_only=False, interpret=True,
                                    tile=TILE)
    _close(dx, ref[0], "dx", rtol=5e-2, atol_frac=8e-3)
    _close(dsh, ref[1], "dsh")
    _close(dul, ref[2], "dulines")
    for i, k in enumerate(W_KEYS):
        _close(dWs[k], ref[3 + i], f"d{k}")


@pytest.mark.parametrize("n", [256, 300])
def test_bwd_kernel_matches_oracle_sigma(rng, n):
    x01, _, ulines, Ws, g = _mats(rng, n)
    g = g.at[:, :3].set(0.0)  # rgb rows are constant zeros in this variant

    def oracle(x, ul, a, b):
        dummy_sh = jnp.zeros((x.shape[0], 1), x.dtype)
        return heads_apply(encode_oracle(x, ul), dummy_sh,
                           {"ws0": a, "ws1": b, "wc0": None, "wc1": None,
                            "wc2": None}, sigma_only=True)

    _, vjp = jax.vjp(oracle, x01, ulines, Ws["ws0"], Ws["ws1"])
    ref = vjp(g)
    dx, dul, dws0, dws1 = _pallas_bwd_sigma(x01, ulines, Ws["ws0"],
                                            Ws["ws1"], g, interpret=True,
                                            tile=TILE)
    _close(dx, ref[0], "dx", rtol=5e-2, atol_frac=8e-3)
    _close(dul, ref[1], "dulines")
    _close(dws0, ref[2], "dws0")
    _close(dws1, ref[3], "dws1")


def test_bwd_kernel_out_of_bounds_points_zero_dx(rng):
    """Clipped points (outside [0,1]^3) must get zero position gradient,
    matching the oracle's clip vjp, while still contributing to dulines."""
    x01, sh, ulines, Ws, g = _mats(rng, 256)
    x01 = x01.at[:64, 0].set(-0.5).at[64:128, 1].set(1.5)
    dx, _, dul, _ = _pallas_bwd(x01, sh, ulines, Ws, g, sigma_only=False,
                                interpret=True, tile=TILE)
    assert np.all(np.asarray(dx)[:64, 0] == 0.0)
    assert np.all(np.asarray(dx)[64:128, 1] == 0.0)
    assert np.abs(np.asarray(dul)).max() > 0.0


@pytest.mark.parametrize("sigma_only", [False, True])
def test_custom_vjp_dispatch_end_to_end(rng, monkeypatch, sigma_only):
    """jax.grad through the PUBLIC entry (cp_field_fused) with the kernel
    path forced on via INTERPRET: exercises the real custom_vjp plumbing
    (argument unpacking, Dense-orientation transposes, sigma routing) that
    the direct _pallas_bwd tests bypass."""
    import gbnerf_tpu.ops.field_fused as ff

    x01, sh, ulines, Ws, _ = _mats(rng, 300)
    cot = jnp.asarray(rng.standard_normal((300, 4)).astype(np.float32))

    def loss(x, s, ul, ws0, ws1, wc0, wc1, wc2):
        Wd = dict(zip(W_KEYS, (ws0, ws1, wc0, wc1, wc2)))
        out = ff.cp_field_fused(x, s, ul, Wd, sigma_only=sigma_only)
        return jnp.sum(out * cot)

    args = (x01, sh, ulines) + tuple(Ws[k] for k in W_KEYS)
    argnums = tuple(range(len(args)))
    ref = jax.grad(loss, argnums)(*args)          # oracle path (CPU)

    monkeypatch.setattr(ff, "INTERPRET", True)
    monkeypatch.setattr(ff, "TILE", 512)
    monkeypatch.setattr(ff, "TILE_BWD", 512)
    got = jax.grad(loss, argnums)(*args)          # kernel path, interpreted

    names = ("dx", "dsh", "dul") + W_KEYS
    for name, a, b in zip(names, got, ref):
        if sigma_only and name in ("dsh", "wc0", "wc1", "wc2"):
            assert float(jnp.abs(a).max()) == 0.0, name
            assert float(jnp.abs(b).max()) == 0.0, name
            continue
        _close(a, b, name, rtol=5e-2, atol_frac=8e-3)
