"""Golden-parity tests against the LIVING reference implementation.

The reference (/root/reference, PyTorch) runs on this image's CPU torch:
rather than re-derived expectations, these tests execute the reference's own
functions on shared fixtures and compare the jnp implementations bit-close.
Covered seams (the ones the original authors left goldenable via their
``pytest=`` determinism flags, run_nerf_helpers.py:320-329, 379-383):

  - get_rays / get_rays_by_coord / ndc_rays   (run_nerf_helpers.py:251-303)
  - sample_pdf                                (run_nerf_helpers.py:306-349)
  - raw2outputs                               (run_nerf_helpers.py:352-406)
  - scheduler alphas_cumprod                  (sd_utils.py:129-139; the
    diffusers scaled_linear schedule reimplemented in torch — sd_utils
    itself needs diffusers, absent here)
  - LLFF pose math                            (load_llff.py:204-258, :264)
  - Embedder frequency encoding               (run_nerf_helpers.py:23-71)
  - SigmaLoss depth likelihood                (loss.py:8-44)
  - Perp-Neg aggregation                      (guidance/perpneg_utils.py:17-48)
  - directional prompt embeddings             (nerf/utils.py:8-74)
  - blender loader end-to-end                 (load_blender.py:36-110)
  - DTU loader end-to-end                     (load_dtu.py:6-71)
  - NeRD loader end-to-end                    (load_nerd.py:244-326)
  - SPIn-NeRF LLFF loader end-to-end          (load_llff.py:68-451)
  - COLMAP binary cross-parser interop        (read_write_model.py:128-481)

Any intentional divergence is asserted around, with the reason stated.
"""
import os
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/DS_NeRF"

# The framework stands alone — golden parity tests only run where the
# upstream reference checkout exists.
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_helpers():
    # run_nerf_helpers imports torchvision purely as a module-level import
    # (no symbol used); stub it so the module loads on this image.
    if "torchvision" not in sys.modules:
        sys.modules["torchvision"] = types.ModuleType("torchvision")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import run_nerf_helpers  # noqa: E402

    return run_nerf_helpers


@pytest.fixture(scope="module")
def ref_llff():
    if "torchvision" not in sys.modules:
        sys.modules["torchvision"] = types.ModuleType("torchvision")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from DS_NeRF import load_llff  # noqa: E402

    return load_llff


def t2n(x):
    return x.detach().cpu().numpy()


# ---------------------------------------------------------------- ray gen

def test_get_rays_golden(ref_helpers, rng):
    from gbnerf_tpu.core.rays import get_rays

    H, W, focal = 13, 21, 17.3
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    c2w[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
    c2w[:3, 3] = rng.normal(size=3).astype(np.float32)

    ro_ref, rd_ref = ref_helpers.get_rays(H, W, focal,
                                          torch.from_numpy(c2w))
    ro, rd = get_rays(H, W, focal, jnp.asarray(c2w))
    np.testing.assert_allclose(np.asarray(ro), t2n(ro_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd), t2n(rd_ref), atol=1e-5)


def test_get_rays_by_coord_golden(ref_helpers, rng):
    from gbnerf_tpu.core.rays import get_rays_by_coord

    H, W, focal = 24, 32, 20.0
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    c2w[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
    c2w[:3, 3] = rng.normal(size=3).astype(np.float32)
    coords = rng.uniform(0, [W, H], size=(50, 2)).astype(np.float32)

    ro_ref, rd_ref = ref_helpers.get_rays_by_coord_np(H, W, focal, c2w,
                                                      coords)
    ro, rd = get_rays_by_coord(H, W, focal, jnp.asarray(c2w),
                               jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(ro), ro_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd), rd_ref, atol=1e-5)


def test_ndc_rays_golden(ref_helpers, rng):
    from gbnerf_tpu.core.rays import ndc_rays

    H, W, focal, near = 30, 40, 35.0, 1.0
    ro = rng.normal(size=(64, 3)).astype(np.float32)
    rd = rng.normal(size=(64, 3)).astype(np.float32)
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.3   # forward-facing, as LLFF assumes
    ro[:, 2] = -np.abs(ro[:, 2]) - 2.0

    ro_ref, rd_ref = ref_helpers.ndc_rays(
        H, W, focal, near, torch.from_numpy(ro), torch.from_numpy(rd))
    o, d = ndc_rays(H, W, focal, near, jnp.asarray(ro), jnp.asarray(rd))
    np.testing.assert_allclose(np.asarray(o), t2n(ro_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), t2n(rd_ref), atol=1e-5)


# ------------------------------------------------------------- sample_pdf

def _pdf_fixture(rng, N=40, B=17):
    bins = np.sort(rng.uniform(1.0, 5.0, size=(N, B)).astype(np.float32), -1)
    weights = rng.uniform(0.0, 1.0, size=(N, B - 1)).astype(np.float32)
    weights[3] = 0.0            # degenerate row: eps path
    weights[5, :4] = 100.0      # concentrated mass
    return bins, weights


def test_sample_pdf_det_golden(ref_helpers, rng):
    """det=True is the reference's own pytest determinism mode
    (run_nerf_helpers.py:320-325): u = linspace, no randomness."""
    from gbnerf_tpu.core.sampling import sample_pdf

    bins, weights = _pdf_fixture(rng)
    s_ref = ref_helpers.sample_pdf(torch.from_numpy(bins),
                                   torch.from_numpy(weights), 31, det=True,
                                   pytest=True)
    s = sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 31, det=True)
    # Inverse-CDF is discontinuous at the cdf steps: when a linspace u
    # lands within one f32-cumsum ulp of a step, torch and jnp may invert
    # into adjacent (zero-width-in-u) intervals. Both are valid inversions;
    # the positional difference is bounded by a bin width (~1e-3 here,
    # observed on 3/1240 elements).
    np.testing.assert_allclose(np.asarray(s), t2n(s_ref), atol=2e-3)


def test_sample_pdf_seeded_u_golden(ref_helpers, rng):
    """pytest=True stochastic mode: the reference overwrites u with
    np.random.seed(0) draws (run_nerf_helpers.py:326-329); we inject the
    identical u through the jnp implementations' golden seam."""
    from gbnerf_tpu.core.sampling import sample_pdf
    from gbnerf_tpu.ops.resample import sample_pdf_fast

    bins, weights = _pdf_fixture(rng)
    N_samples = 23
    s_ref = ref_helpers.sample_pdf(torch.from_numpy(bins),
                                   torch.from_numpy(weights), N_samples,
                                   det=False, pytest=True)
    np.random.seed(0)
    u = np.random.rand(bins.shape[0], N_samples).astype(np.float32)

    s = sample_pdf(jnp.asarray(bins), jnp.asarray(weights), N_samples,
                   u=jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(s), t2n(s_ref), atol=2e-5)

    s_fast = sample_pdf_fast(jnp.asarray(bins), jnp.asarray(weights),
                             N_samples, u=jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(s_fast), t2n(s_ref), atol=3e-5)


# ------------------------------------------------------------ raw2outputs

def test_raw2outputs_golden(ref_helpers, rng):
    from gbnerf_tpu.core.render import raw2outputs

    N, S = 32, 24
    raw = rng.normal(size=(N, S, 4)).astype(np.float32) * 2.0
    z_vals = np.sort(rng.uniform(1.0, 5.0, size=(N, S)).astype(np.float32), -1)
    rays_d = rng.normal(size=(N, 3)).astype(np.float32)

    for white_bkgd in (False, True):
        rgb_r, disp_r, acc_r, w_r, depth_r, alpha_r = ref_helpers.raw2outputs(
            torch.from_numpy(raw), torch.from_numpy(z_vals),
            torch.from_numpy(rays_d), raw_noise_std=0,
            white_bkgd=white_bkgd, need_alpha=True)
        rgb, disp, acc, w, depth, alpha = raw2outputs(
            jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d),
            raw_noise_std=0.0, white_bkgd=white_bkgd)
        np.testing.assert_allclose(np.asarray(rgb), t2n(rgb_r), atol=3e-5)
        np.testing.assert_allclose(np.asarray(w), t2n(w_r), atol=3e-5)
        np.testing.assert_allclose(np.asarray(acc), t2n(acc_r), atol=3e-5)
        np.testing.assert_allclose(np.asarray(depth), t2n(depth_r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(alpha), t2n(alpha_r), atol=3e-5)
        # disp: documented divergence — we clamp to 1/z_near on empty rays
        # (core/render.py). On occupied rays (acc >> 0) the two agree:
        # E[z | termination] >= z_near makes the clamp inactive.
        occ = t2n(acc_r) > 0.5
        assert occ.any()
        np.testing.assert_allclose(np.asarray(disp)[occ], t2n(disp_r)[occ],
                                   rtol=1e-4)


# ---------------------------------------------------- diffusion schedule

def test_alphas_cumprod_golden():
    """The exact scheduler state the reference trains against: diffusers'
    scaled_linear betas from the SD1.5-inpaint config (beta_start 0.00085,
    beta_end 0.012, 1000 steps), consumed at sd_utils.py:139 as
    self.alphas = scheduler.alphas_cumprod. sd_utils needs diffusers (absent
    here), so the three defining lines are recomputed in torch float64."""
    from gbnerf_tpu.guidance.schedule import DiffusionSchedule

    betas = torch.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000,
                           dtype=torch.float64) ** 2
    ac_ref = torch.cumprod(1.0 - betas, dim=0)

    sched = DiffusionSchedule.sd_v1()
    np.testing.assert_allclose(sched.alphas_cumprod, t2n(ac_ref), rtol=2e-6)
    # the min/max step slicing used by the annealed timestep (sd_utils:130)
    mn, mx = sched.step_range((0.02, 0.98))
    assert (mn, mx) == (int(1000 * 0.02), int(1000 * 0.98))


# ---------------------------------------------------------- LLFF pose math

def _random_poses(rng, n=7):
    poses = np.zeros((n, 3, 5), np.float32)
    for i in range(n):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        poses[i, :3, :3] = q
        poses[i, :3, 3] = rng.normal(size=3) * 2.0
    poses[:, :3, 4] = np.array([96.0, 128.0, 100.0])  # hwf column
    return poses


def test_llff_pose_math_golden(ref_llff, rng):
    from gbnerf_tpu.data.llff import (poses_avg, recenter_poses,
                                      render_path_spiral, viewmatrix)

    poses = _random_poses(rng)
    z = rng.normal(size=3).astype(np.float32)
    up = rng.normal(size=3).astype(np.float32)
    pos = rng.normal(size=3).astype(np.float32)
    np.testing.assert_allclose(viewmatrix(z, up, pos),
                               ref_llff.viewmatrix(z, up, pos), atol=1e-6)
    np.testing.assert_allclose(poses_avg(poses), ref_llff.poses_avg(poses),
                               atol=1e-6)
    np.testing.assert_allclose(recenter_poses(poses),
                               ref_llff.recenter_poses(poses), atol=1e-5)

    c2w = ref_llff.poses_avg(poses)
    up_v = poses[:, :3, 1].sum(0)
    rads = np.array([0.8, 0.6, 0.4])
    ref_spiral = np.stack(ref_llff.render_path_spiral(
        c2w, up_v, rads, focal=50.0, zdelta=0.2, zrate=0.5, rots=2, N=30))
    # divergence, documented at data/llff.py::render_path_spiral: the
    # reference's zdelta arg is computed but UNUSED inside the function —
    # our signature drops it.
    spiral = render_path_spiral(c2w, up_v, rads, focal=50.0, zrate=0.5,
                                rots=2, N=30)
    np.testing.assert_allclose(spiral, ref_spiral.astype(np.float32),
                               atol=1e-5)


def test_spherify_golden(ref_llff, rng):
    from gbnerf_tpu.data.llff import spherify_poses

    poses = _random_poses(rng, n=9)
    bds = np.stack([np.full(9, 1.5, np.float32), np.full(9, 6.0, np.float32)],
                   -1)
    p_ref, rp_ref, bds_ref, _sc, _inv = ref_llff.spherify_poses(
        poses.copy(), bds.copy())
    p, rp, b = spherify_poses(poses.copy(), bds.copy())
    np.testing.assert_allclose(p[:, :3, :4], np.asarray(p_ref)[:, :3, :4],
                               atol=1e-4)
    np.testing.assert_allclose(b, np.asarray(bds_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rp)[:, :3, :4],
                               np.asarray(rp_ref)[:, :3, :4], atol=1e-4)


def test_depth2normal_geo_golden(rng):
    """depth2normal_geo vs the reference's unfold + AᵀA + inverse formula
    (run.py:2458-2474), including edge windows (unfold zero-pads, so edge
    pixels solve over in-bounds points only) and k larger than the map.
    Well-posed pixels must match; our det-floored pixels are excluded."""
    from gbnerf_tpu.core.normals import depth2normal_geo

    def ref_normals(points, k):
        # the reference formula, faithfully (torch.linalg.inv, f32)
        p = torch.from_numpy(np.asarray(points, np.float32))
        p = p.permute(2, 0, 1)[None]                     # b,3,h,w
        B, C, H, W = p.shape
        pm = torch.nn.functional.unfold(p, (k, k), padding=(k - 1) // 2)
        A = pm.transpose(1, 2).reshape(B, H, W, C, k * k).transpose(-1, -2)
        At = A.transpose(-1, -2)
        M = At @ A
        ones = torch.ones(B, H, W, k * k, 1)
        n = (torch.linalg.inv(M) @ (At @ ones)).squeeze(-1)
        return n[0].numpy()

    for H, W, k in ((20, 26, 7), (24, 32, 31)):
        xx, yy = np.meshgrid(np.linspace(-1, 1, W),
                             np.linspace(-0.8, 0.8, H), indexing="xy")
        pts = np.stack(
            [xx, yy, 2.0 + 0.1 * rng.standard_normal((H, W))], -1)
        pts = pts.astype(np.float32)
        ours = np.asarray(depth2normal_geo(jnp.asarray(pts), k=k))
        theirs = ref_normals(pts, k)
        # compare where BOTH are well-posed (reference inv can blow up on
        # near-singular windows; ours floors them to 0 by design)
        ok = (np.isfinite(theirs).all(-1) & (np.abs(theirs) < 10).all(-1)
              & (np.abs(ours) > 1e-9).any(-1, keepdims=False))
        assert ok.mean() > 0.5, f"too few comparable pixels ({ok.mean()})"
        np.testing.assert_allclose(ours[ok], theirs[ok], rtol=2e-2,
                                   atol=2e-3)


def test_depth2normal_grad_finite_small_map(rng):
    """Regression (priorN NaN): d(normal)/d(depth) must be finite even on
    maps smaller than the window with exactly-singular windows — the
    1/det where-trap produced 0·inf cotangents and killed training."""
    import jax

    from gbnerf_tpu.core.normals import depth2normal_geo, depth2xyz

    H, W, focal = 24, 32, 14.3
    K = jnp.asarray([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                    jnp.float32)
    base = (2.5 + 0.8 * np.sin(np.linspace(0, 3, H))[:, None]
            + 0.5 * np.cos(np.linspace(0, 2, W))[None, :])
    depth = jnp.asarray(base + 0.02 * rng.standard_normal((H, W)),
                        jnp.float32)
    cot = jnp.asarray(rng.standard_normal((H, W, 3)), jnp.float32)

    def f(d):
        n = (depth2normal_geo(depth2xyz(d, K)) + 1.0) / 2.0
        return jnp.sum(n * cot)

    n = depth2normal_geo(depth2xyz(depth, K))
    assert bool(jnp.isfinite(n).all()), "forward has non-finite normals"
    g = jax.grad(f)(depth)
    assert bool(jnp.isfinite(g).all()), "backward has non-finite grads"


def test_nerf_mlp_ckpt_convert_golden(ref_helpers, rng):
    """Full-network golden parity: a randomly-initialized reference torch
    NeRF, its state_dict converted by tools/convert_ref_ckpt.py's mapping,
    must reproduce the torch forward through OUR embedder + NeRFMLP — the
    end-to-end seam a user crosses when migrating reference checkpoints."""
    import sys as _sys
    from pathlib import Path
    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from convert_ref_ckpt import torch_nerf_to_flax, infer_skips

    from gbnerf_tpu.core.encoding import freq_encode
    from gbnerf_tpu.core.fields import NeRFMLP

    multires, multires_views = 10, 4
    ref = ref_helpers.NeRF(D=8, W=256, input_ch=3 * (1 + 2 * multires),
                           input_ch_views=3 * (1 + 2 * multires_views),
                           skips=[4], use_viewdirs=True)
    params = torch_nerf_to_flax(ref.state_dict())
    assert infer_skips(params) == (4,)

    pts = rng.standard_normal((64, 3)).astype(np.float32)
    dirs = rng.standard_normal((64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    with torch.no_grad():
        emb = torch.cat([
            torch.from_numpy(np.asarray(
                freq_encode(jnp.asarray(pts), multires))),
            torch.from_numpy(np.asarray(
                freq_encode(jnp.asarray(dirs), multires_views)))], -1)
        # reference outputs [rgb, alpha] (run_nerf_helpers.py:127)
        ref_out = t2n(ref(emb))

    ours = NeRFMLP(depth=8, width=256, skips=(4,), multires=multires,
                   multires_views=multires_views, use_viewdirs=True)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(pts),
                                jnp.asarray(dirs)))
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-5)


def test_nerf_mlp_ckpt_convert_golden_no_viewdirs(ref_helpers, rng):
    """Same seam for use_viewdirs=False (single output_linear head)."""
    import sys as _sys
    from pathlib import Path
    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from convert_ref_ckpt import torch_nerf_to_flax

    from gbnerf_tpu.core.encoding import freq_encode
    from gbnerf_tpu.core.fields import NeRFMLP

    multires = 6
    ref = ref_helpers.NeRF(D=4, W=96, input_ch=3 * (1 + 2 * multires),
                           input_ch_views=0, skips=[2], use_viewdirs=False)
    params = torch_nerf_to_flax(ref.state_dict())

    pts = rng.standard_normal((32, 3)).astype(np.float32)
    with torch.no_grad():
        emb = torch.from_numpy(np.asarray(
            freq_encode(jnp.asarray(pts), multires)))
        ref_out = t2n(ref(emb))

    ours = NeRFMLP(depth=4, width=96, skips=(2,), multires=multires,
                   use_viewdirs=False)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(pts), None))
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-5)


# ------------------------------------------- guidance/loss seams (round 2)

def _load_ref_module(name, relpath):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_perpneg():
    return _load_ref_module("ref_perpneg_utils", "guidance/perpneg_utils.py")


@pytest.fixture(scope="module")
def ref_nerf_utils():
    return _load_ref_module("ref_nerf_utils", "nerf/utils.py")


@pytest.fixture(scope="module")
def ref_loss_mod():
    return _load_ref_module("ref_loss", "loss.py")


def test_embedder_golden(ref_helpers, rng):
    """freq_encode layout/values == reference Embedder (both multires)."""
    from gbnerf_tpu.core.encoding import freq_encode

    # reference Embedder hardcodes input_dims=3 (run_nerf_helpers.py:59)
    for multires in (10, 4, 6):
        embed_fn, out_dim = ref_helpers.get_embedder(multires, 0)
        x = rng.standard_normal((5, 3)).astype(np.float32)
        ref = t2n(embed_fn(torch.from_numpy(x)))
        got = np.asarray(freq_encode(jnp.asarray(x), multires))
        assert got.shape[-1] == out_dim
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_sigma_loss_golden(ref_loss_mod, rng):
    """σ-likelihood depth loss == reference SigmaLoss.calculate_loss
    (deterministic seam: perturb=0, raw_noise_std=0, shared field)."""
    from gbnerf_tpu.train.losses import sigma_loss

    N, S = 8, 16
    ro = rng.standard_normal((N, 3)).astype(np.float32)
    rd = rng.standard_normal((N, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    depths = (1.0 + 2.0 * rng.random(N)).astype(np.float32)
    near = 0.5

    def raw_np(pts):
        sig = np.sin(pts.sum(-1)) * 2.0 + 0.3 * pts[..., 0]
        return np.concatenate(
            [np.zeros(pts.shape[:-1] + (3,), np.float32), sig[..., None]],
            axis=-1).astype(np.float32)

    ref = ref_loss_mod.SigmaLoss(S, perturb=0, raw_noise_std=0).calculate_loss(
        torch.from_numpy(ro), torch.from_numpy(rd), None,
        torch.tensor(near), None, torch.from_numpy(depths),
        lambda pts, vd, net: torch.from_numpy(raw_np(pts.numpy())), None)
    got = sigma_loss(
        lambda pts, vd: jnp.asarray(raw_np(np.asarray(pts))),
        jnp.asarray(ro), jnp.asarray(rd), None, near, jnp.asarray(depths),
        N_samples=S, perturb=False, raw_noise_std=0.0)
    np.testing.assert_allclose(np.asarray(got), t2n(ref), rtol=1e-5,
                               atol=1e-6)


def test_perpneg_aggregator_golden(ref_perpneg, rng):
    """Perpendicular aggregation == reference, incl. exact-zero weights.

    The reference drops aux terms with |w| <= 1e-4 entirely; ours scales by
    w (identical at w=0 and indistinguishable below 1e-4) — fixture avoids
    the open interval (0, 1e-4) where the two differ by < 1e-4·|perp|.
    """
    from gbnerf_tpu.guidance.perpneg import weighted_perpendicular_aggregator

    B = 2
    x = rng.standard_normal((3 * B, 4, 8, 8)).astype(np.float32)
    w_aux = np.array([0.7, 0.0, -1.3, 0.5], np.float32)     # [2B]
    w_full = np.concatenate([np.ones(B, np.float32), w_aux])
    ref = ref_perpneg.weighted_perpendicular_aggregator(
        torch.from_numpy(x.copy()), torch.from_numpy(w_full), B)
    got = weighted_perpendicular_aggregator(
        jnp.asarray(x), jnp.asarray(w_aux), B)
    np.testing.assert_allclose(np.asarray(got), t2n(ref), rtol=1e-5,
                               atol=1e-5)


def test_directional_embeddings_golden(ref_nerf_utils, rng):
    """Azimuth-conditioned Perp-Neg prompt embeddings == reference across
    both hemispheres, blend boundaries, and the decay cutoffs."""
    from gbnerf_tpu.guidance.directional import (adjust_text_embeddings,
                                                 get_pos_neg_text_embeddings)

    L, D = 7, 5
    emb_np = {k: rng.standard_normal((1, L, D)).astype(np.float32)
              for k in ("front", "side", "back")}
    emb_t = {k: torch.from_numpy(v) for k, v in emb_np.items()}
    emb_j = {k: jnp.asarray(v[0]) for k, v in emb_np.items()}
    opt = types.SimpleNamespace(front_decay_factor=2.0,
                                side_decay_factor=10.0, negative_w=-2.0)

    azimuths = (-179.0, -90.0, -45.0, -5.0, 0.0, 10.0, 85.0, 89.9, 90.0,
                135.0, 179.0)
    for az in azimuths:
        ref_z, ref_w = ref_nerf_utils.get_pos_neg_text_embeddings(
            emb_t, az, opt)
        got_z, got_w = get_pos_neg_text_embeddings(emb_j, az)
        np.testing.assert_allclose(np.asarray(got_z), t2n(ref_z), rtol=1e-5,
                                   atol=1e-6, err_msg=f"az={az}")
        np.testing.assert_allclose(np.asarray(got_w), t2n(ref_w), rtol=1e-5,
                                   atol=1e-7, err_msg=f"az={az}")

    # batch interleave: reference returns [B·K] weights incl. the leading
    # ones for the main direction; ours returns the aux [2B] slice.
    az_b = np.array([-135.0, 30.0, 88.0], np.float32)
    ref_zb, ref_wb = ref_nerf_utils.adjust_text_embeddings(
        emb_t, torch.from_numpy(az_b), opt)
    got_zb, got_wb = adjust_text_embeddings(emb_j, jnp.asarray(az_b))
    np.testing.assert_allclose(np.asarray(got_zb), t2n(ref_zb), rtol=1e-5,
                               atol=1e-6)
    B = az_b.shape[0]
    np.testing.assert_allclose(t2n(ref_wb)[:B], 1.0)
    np.testing.assert_allclose(np.asarray(got_wb), t2n(ref_wb)[B:],
                               rtol=1e-5, atol=1e-7)


# ------------------------------------------- alt dataset loaders (round 2)

@pytest.fixture(scope="module")
def ref_blender():
    if "torchvision" not in sys.modules:
        sys.modules["torchvision"] = types.ModuleType("torchvision")
    return _load_ref_module("ref_load_blender", "load_blender.py")


@pytest.fixture(scope="module")
def ref_dtu():
    return _load_ref_module("ref_load_dtu", "load_dtu.py")


def _write_blender_fixture(tmp, rng):
    import imageio.v2 as imageio
    import json as _json

    H = W = 8
    for s, n in (("train", 3), ("val", 2), ("test", 2)):
        os.makedirs(os.path.join(tmp, s), exist_ok=True)
        frames = []
        for i in range(n):
            img = (rng.random((H, W, 4)) * 255).astype(np.uint8)
            imageio.imwrite(os.path.join(tmp, s, f"r_{i}.png"), img)
            M = np.eye(4)
            M[:3, 3] = rng.normal(size=3)
            frames.append({"file_path": f"./{s}/r_{i}",
                           "transform_matrix": M.tolist()})
        with open(os.path.join(tmp, f"transforms_{s}.json"), "w") as fp:
            _json.dump({"camera_angle_x": 0.7, "frames": frames}, fp)
    # masks/objects live INSIDE the split dir (reference load_blender.py:
    # fname.split('/r_')[0] + '/mask/m_*.png' → <base>/train/mask/)
    os.makedirs(os.path.join(tmp, "train", "mask"))
    os.makedirs(os.path.join(tmp, "train", "object"))
    for i in range(3):
        imageio.imwrite(os.path.join(tmp, "train", "mask", f"m_{i}.png"),
                        (rng.random((H, W)) * 255).astype(np.uint8))
        imageio.imwrite(os.path.join(tmp, "train", "object", f"o_{i}.png"),
                        (rng.random((H, W, 4)) * 255).astype(np.uint8))


def test_blender_loader_golden(ref_blender, tmp_path, rng):
    import os as _os

    from gbnerf_tpu.data.blender import load_blender_data

    tmp = str(tmp_path / "blender")
    _os.makedirs(tmp)
    _write_blender_fixture(tmp, rng)

    r_imgs, r_poses, r_rp, r_hwf, r_split, r_masks, r_objs = \
        ref_blender.load_blender_data(tmp, half_res=False, testskip=1)
    imgs, poses, rp, hwf, split, masks, objs = load_blender_data(
        tmp, half_res=False, testskip=1)

    np.testing.assert_allclose(imgs, r_imgs, atol=1e-6)
    np.testing.assert_allclose(poses, r_poses, atol=1e-6)
    np.testing.assert_allclose(rp, t2n(r_rp), atol=1e-5)
    np.testing.assert_allclose(hwf, r_hwf, rtol=1e-6)
    for a, b in zip(split, r_split):
        assert (a == b).all()
    np.testing.assert_allclose(masks, r_masks, atol=1e-6)
    np.testing.assert_allclose(objs, r_objs, atol=1e-6)


def test_dtu_loader_golden(ref_dtu, tmp_path, rng):
    import imageio.v2 as imageio

    from gbnerf_tpu.data.blender import load_dtu_data

    tmp = str(tmp_path / "dtu")
    os.makedirs(os.path.join(tmp, "image"))
    n, H, W = 3, 8, 8
    cams = {}
    for i in range(n):
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(tmp, "image", f"{i:03d}.jpg"), img)
        K = np.array([[20.0, 0, 4], [0, 22.0, 4], [0, 0, 1]])
        R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        t = rng.normal(size=3)
        wm = np.eye(4)
        wm[:3] = K @ np.concatenate([R, t[:, None]], 1)
        cams[f"world_mat_{i}"] = wm
        sm = np.eye(4)
        sm[:3, :3] *= 2.0
        sm[:3, 3] = [0.1, 0.2, 0.3]
        cams[f"scale_mat_{i}"] = sm
    np.savez(os.path.join(tmp, "cameras.npz"), **cams)

    r_imgs, r_poses, r_hwf = ref_dtu.load_dtu_data(tmp)
    imgs, poses, hwf = load_dtu_data(tmp)
    np.testing.assert_allclose(imgs, r_imgs, atol=1e-6)
    np.testing.assert_allclose(poses, r_poses, atol=1e-5)
    np.testing.assert_allclose(hwf, r_hwf, rtol=1e-6)


@pytest.fixture(scope="module")
def ref_nerd():
    if "matplotlib" not in sys.modules:
        import matplotlib
        matplotlib.use("Agg")
    return _load_ref_module("ref_load_nerd", "load_nerd.py")


@pytest.mark.parametrize("spherify", [False, True])
def test_nerd_loader_golden(ref_nerd, tmp_path, rng, spherify):
    """NeRD layout end-to-end: masks live INSIDE the images dir
    (load_nerd.py:92 'images'+sfx+'/masks') — this test runs the reference
    loader on a synthesized scene and compares images/masks/objects/bds/
    poses/render path against load_nerd_data. spherify=True additionally
    exercises the load-time spherify_poses branch (load_nerd.py:264-265)."""
    import imageio.v2 as imageio

    from gbnerf_tpu.data.llff import load_nerd_data

    tmp = str(tmp_path / "nerd")
    n, H0, W0, f = 4, 32, 40, 4
    H, W = H0 // f, W0 // f
    os.makedirs(os.path.join(tmp, "images"))
    os.makedirs(os.path.join(tmp, f"images_{f}", "masks"))
    pb = []
    for i in range(n):
        imageio.imwrite(os.path.join(tmp, "images", f"im_{i}.jpg"),
                        (rng.random((H0, W0, 3)) * 255).astype(np.uint8))
        imageio.imwrite(os.path.join(tmp, f"images_{f}", f"im_{i}.jpg"),
                        (rng.random((H, W, 3)) * 255).astype(np.uint8))
        imageio.imwrite(
            os.path.join(tmp, f"images_{f}", "masks", f"im_{i}.jpg"),
            (255 * (rng.random((H, W)) > 0.5)).astype(np.uint8))
        th = 2 * np.pi * i / n
        pos = np.array([2 * np.sin(th), 0.1 * i, 2 * np.cos(th)])
        z = pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        # llff pose_bounds convention: [down, right, back] columns + hwf
        m = np.stack([-y, x, z], 1)
        pose = np.concatenate(
            [np.concatenate([m, pos[:, None]], 1),
             np.array([[H0], [W0], [30.0]])], 1)        # [3,5]
        pb.append(np.concatenate([pose.ravel(), [1.0, 6.0]]))
    np.save(os.path.join(tmp, "poses_bounds.npy"),
            np.stack(pb).astype(np.float64))

    (r_imgs, r_poses, r_bds, r_rp, r_itest, r_masks,
     r_objs) = ref_nerd.load_nerd_data(tmp, factor=f, recenter=True,
                                       bd_factor=0.75, spherify=spherify)
    scene = load_nerd_data(tmp, factor=f, recenter=True, bd_factor=0.75,
                           spherify=spherify)

    np.testing.assert_allclose(scene.images, r_imgs, atol=1e-6)
    np.testing.assert_allclose(scene.masks, r_masks, atol=1e-6)
    # objects ride in the inpainted_depths slot (channel 0; documented)
    np.testing.assert_allclose(scene.inpainted_depths, r_objs[..., 0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.bds).squeeze(),
                               np.asarray(r_bds).squeeze(), rtol=1e-5)
    np.testing.assert_allclose(scene.poses[:, :3, :4], r_poses[:, :3, :4],
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(scene.render_poses)[:, :3, :4],
        np.asarray(r_rp)[:, :3, :4], atol=1e-4)


def test_spinnerf_llff_loader_golden(ref_llff, tmp_path, rng):
    """THE primary production path: SPIn-NeRF LLFF loading (origin=True —
    RGB_inpainted / label / Depth_inpainted under images_4/) end-to-end
    against the reference, incl. its per-file mask max-normalization,
    depth /255, bd rescale, recentering, plain spiral path
    (spherify_hack=False: our loader documents that branch as a no-op
    divergence), and the hard 40/rest pose split (run on 44 views so the
    split is real)."""
    import imageio.v2 as imageio

    from gbnerf_tpu.data.llff import load_llff_data

    tmp = str(tmp_path / "spin")
    # Real SPIn-NeRF layout: poses_bounds carries test+train poses but the
    # asset dirs hold ONLY the train views (the first 40 poses have no
    # images) — both loaders infer the 40/rest split from that difference.
    n, n_test, H0, W0, f = 44, 40, 32, 40, 4
    H, W = H0 // f, W0 // f
    os.makedirs(os.path.join(tmp, "images"))
    for sub in ("RGB_inpainted", "label", "Depth_inpainted"):
        os.makedirs(os.path.join(tmp, f"images_{f}", sub))
    pb = []
    for i in range(n):
        imageio.imwrite(os.path.join(tmp, "images", f"im_{i:03d}.jpg"),
                        (rng.random((H0, W0, 3)) * 255).astype(np.uint8))
        if i >= n_test:
            imageio.imwrite(
                os.path.join(tmp, f"images_{f}", "RGB_inpainted",
                             f"im_{i:03d}.png"),
                (rng.random((H, W, 3)) * 255).astype(np.uint8))
            imageio.imwrite(
                os.path.join(tmp, f"images_{f}", "label", f"im_{i:03d}.png"),
                (200 * (rng.random((H, W)) > 0.6)).astype(np.uint8))
            imageio.imwrite(
                os.path.join(tmp, f"images_{f}", "Depth_inpainted",
                             f"im_{i:03d}.png"),
                (rng.random((H, W)) * 255).astype(np.uint8))
        th = 2 * np.pi * i / n
        pos = np.array([2 * np.sin(th), 0.05 * i, 2 * np.cos(th)])
        z = pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        m = np.stack([-y, x, z], 1)            # llff [down, right, back]
        pose = np.concatenate(
            [np.concatenate([m, pos[:, None]], 1),
             np.array([[H0], [W0], [30.0]])], 1)
        pb.append(np.concatenate([pose.ravel(), [1.0, 6.0]]))
    np.save(os.path.join(tmp, "poses_bounds.npy"),
            np.stack(pb).astype(np.float64))

    (r_imgs, r_poses, r_bds, r_rp, r_itest, r_masks, r_depths, r_midx,
     r_ptest) = ref_llff.load_llff_data(
        tmp, factor=f, recenter=True, bd_factor=0.75, spherify=False,
        spherify_hack=False, origin=True)
    scene = load_llff_data(tmp, factor=f, origin=True, recenter=True,
                           bd_factor=0.75, spherify=False)

    np.testing.assert_allclose(scene.images, r_imgs, atol=1e-6)
    np.testing.assert_allclose(scene.masks, r_masks, atol=1e-6)
    np.testing.assert_allclose(scene.inpainted_depths, r_depths, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.bds).squeeze(),
                               np.asarray(r_bds).squeeze(), rtol=1e-5)
    np.testing.assert_allclose(scene.poses[:, :3, :4], r_poses[:, :3, :4],
                               atol=1e-5)
    np.testing.assert_allclose(scene.poses_test[:, :3, :4],
                               r_ptest[:, :3, :4], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(scene.render_poses)[:, :3, :4],
        np.asarray(r_rp)[:, :3, :4], atol=1e-4)


@pytest.fixture(scope="module")
def ref_colmap():
    return _load_ref_module("ref_read_write_model",
                            "colmapUtils/read_write_model.py")


def _toy_model(rng, colmap_mod=None):
    """A small COLMAP model in the given module's record types."""
    from gbnerf_tpu.data import colmap as ours

    mk_cam = (colmap_mod.Camera if colmap_mod else ours.Camera)
    mk_img = (colmap_mod.Image if colmap_mod else ours.Image)
    mk_pt = (colmap_mod.Point3D if colmap_mod else ours.Point3D)
    cams = {1: mk_cam(id=1, model="PINHOLE", width=64, height=48,
                      params=np.array([50.0, 52.0, 32.0, 24.0]))}
    images, points = {}, {}
    for i in (1, 2):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        q *= np.sign(q[0]) or 1.0
        images[i] = mk_img(
            id=i, qvec=q, tvec=rng.normal(size=3), camera_id=1,
            name=f"im_{i}.jpg",
            xys=rng.uniform(0, 48, size=(3, 2)),
            point3D_ids=np.array([1, -1, 2], np.int64))
    for p in (1, 2):
        points[p] = mk_pt(
            id=p, xyz=rng.normal(size=3),
            rgb=(rng.random(3) * 255).astype(np.uint8),
            error=float(rng.random()),
            image_ids=np.array([1, 2]), point2D_idxs=np.array([0, 2]))
    return cams, images, points


def _assert_models_equal(a, b):
    """(cams, images, points) field-wise equality across record types."""
    for da, db in zip(a, b):
        assert set(da) == set(db)
        for k in da:
            ra, rb = da[k], db[k]
            for field in ("id", "model", "width", "height", "params", "qvec",
                          "tvec", "camera_id", "name", "xys", "point3D_ids",
                          "xyz", "rgb", "error", "image_ids", "point2D_idxs"):
                va = getattr(ra, field, None)
                vb = getattr(rb, field, None)
                if va is None and vb is None:
                    continue
                if isinstance(va, np.ndarray) or isinstance(vb, np.ndarray):
                    np.testing.assert_allclose(
                        np.asarray(va, np.float64).ravel(),
                        np.asarray(vb, np.float64).ravel(),
                        rtol=1e-12, err_msg=f"{k}.{field}")
                else:
                    assert va == vb, (k, field, va, vb)


def test_colmap_binary_interop_golden(ref_colmap, tmp_path, rng):
    """Cross-parser interop: models written by OUR binary writers parse
    byte-correctly with the reference's read_model, and models written by
    the reference's writers parse with ours (colmapUtils/
    read_write_model.py:128-481)."""
    from gbnerf_tpu.data import colmap as ours

    # ours → reference
    d1 = str(tmp_path / "ours")
    os.makedirs(d1)
    cams, images, points = _toy_model(rng)
    ours.write_model(cams, images, points, d1, ext=".bin")
    ref_model = ref_colmap.read_model(d1, ext=".bin")
    _assert_models_equal((cams, images, points), ref_model)

    # reference → ours
    d2 = str(tmp_path / "ref")
    os.makedirs(d2)
    r_cams, r_images, r_points = _toy_model(rng, colmap_mod=ref_colmap)
    ref_colmap.write_model(r_cams, r_images, r_points, d2, ext=".bin")
    got = (ours.read_cameras_binary(os.path.join(d2, "cameras.bin")),
           ours.read_images_binary(os.path.join(d2, "images.bin")),
           ours.read_points3d_binary(os.path.join(d2, "points3D.bin")))
    _assert_models_equal((r_cams, r_images, r_points), got)


@pytest.fixture(scope="module")
def ref_run(ref_helpers):
    """Import the reference's run.py (render_rays lives there). Stubs the
    module-level imports absent from this image (dotenv, lpips, omegaconf,
    tinycudann) and no-ops torch.set_default_device('cuda') (run.py:41)."""
    for name in ("dotenv", "lpips", "omegaconf", "tinycudann"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "dotenv":
                mod.load_dotenv = lambda *a, **k: None
            if name == "omegaconf":
                mod.OmegaConf = object
            sys.modules[name] = mod
    if "matplotlib" not in sys.modules:
        import matplotlib
        matplotlib.use("Agg")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    orig = torch.set_default_device
    torch.set_default_device = lambda *a, **k: None
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ref_run", "/root/reference/run.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_run"] = mod
        spec.loader.exec_module(mod)
    finally:
        torch.set_default_device = orig
    return mod


@pytest.mark.parametrize("lindisp", [False, True])
def test_render_rays_golden(ref_run, ref_helpers, rng, lindisp):
    """END-TO-END render golden: the reference's full hierarchical
    render_rays (run.py:2235-2381 — z-val construction, run_network
    embed+query, raw2outputs, sample_pdf fine resampling, merge, second
    pass) vs our render_rays on the SAME converted MLP weights and rays.
    Deterministic configuration (perturb=0 → det inverse-CDF), both
    lindisp branches, in float64 on both sides: the hierarchical pipeline
    is chaotic (an ulp-level field difference moves fine-sample positions
    by ~1e-2 where the CDF is flat), so a strict glue comparison needs the
    framework-libm noise floor pushed below the chaos threshold. Composes
    every component golden into one pipeline check."""
    import sys as _sys
    from pathlib import Path
    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from convert_ref_ckpt import torch_nerf_to_flax

    import jax
    from gbnerf_tpu.core.fields import NeRFMLP, make_field_fn
    from gbnerf_tpu.core.render import render_rays

    multires, multires_views = 4, 2
    D, W, skip = 3, 32, 1
    in_ch = 3 * (1 + 2 * multires)
    in_ch_views = 3 * (1 + 2 * multires_views)
    torch.manual_seed(3)
    coarse = ref_helpers.NeRF(D=D, W=W, input_ch=in_ch,
                              input_ch_views=in_ch_views, skips=[skip],
                              use_viewdirs=True).double()
    fine = ref_helpers.NeRF(D=D, W=W, input_ch=in_ch,
                            input_ch_views=in_ch_views, skips=[skip],
                            use_viewdirs=True).double()

    embed_fn, _ = ref_helpers.get_embedder(multires, 0)
    embeddirs_fn, _ = ref_helpers.get_embedder(multires_views, 0)

    def nqf(inputs, viewdirs, fn):
        return ref_run.run_network(inputs, viewdirs, fn, embed_fn,
                                   embeddirs_fn, netchunk=1 << 16)

    N, NS, NI = 24, 17, 9
    rays_o = rng.standard_normal((N, 3))
    rays_d = (rng.standard_normal((N, 3)) * rng.uniform(0.5, 1.5, (N, 1)))
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = rng.uniform(0.3, 0.8, (N, 1))
    far = rng.uniform(3.0, 5.0, (N, 1))

    rb = np.concatenate([rays_o, rays_d, near, far, viewdirs], -1)  # [N,11]
    with torch.no_grad():
        ret = ref_run.render_rays(
            torch.from_numpy(rb), network_fn=coarse, network_query_fn=nqf,
            N_samples=NS, N_importance=NI, network_fine=fine,
            perturb=0.0, raw_noise_std=0.0, white_bkgd=False,
            lindisp=lindisp, pytest=False)

    jax.config.update("jax_enable_x64", True)
    try:
        to64 = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), t)
        mlp = NeRFMLP(depth=D, width=W, skips=(skip,), multires=multires,
                      multires_views=multires_views, use_viewdirs=True,
                      compute_dtype=jnp.float64)
        cfn = make_field_fn(mlp, to64(torch_nerf_to_flax(coarse.state_dict())))
        ffn = make_field_fn(mlp, to64(torch_nerf_to_flax(fine.state_dict())))
        out = render_rays(
            cfn, ffn, jnp.asarray(rays_o), jnp.asarray(rays_d),
            jnp.asarray(viewdirs), jnp.asarray(near), jnp.asarray(far),
            N_samples=NS, N_importance=NI, lindisp=lindisp, perturb=False)
        out = jax.tree_util.tree_map(np.asarray, out)
    finally:
        jax.config.update("jax_enable_x64", False)

    for ref_k, got in (("rgb_map", out.rgb), ("depth_map", out.depth),
                       ("acc_map", out.acc), ("weights", out.weights),
                       ("z_vals", out.z_vals), ("z_std", out.z_std),
                       ("rgb0", out.rgb0), ("acc0", out.acc0),
                       ("disp0", out.disp0)):
        r = t2n(ret[ref_k])
        g = np.asarray(got)
        if ref_k.startswith("disp"):
            # Documented divergence (core/render.py raw2outputs): we clamp
            # disparity at the physical max 1/z_near on empty rays; compare
            # only where the reference value is below that clamp.
            keep = r < 0.99 / near[:, 0]
            r, g = r[keep], g[keep]
        # Noise floor: the converter stores f32 params (the reference's own
        # checkpoint precision); residual ~5e-8 through the f64 pipeline.
        np.testing.assert_allclose(g, r, rtol=1e-6, atol=1e-6,
                                   err_msg=f"{ref_k} lindisp={lindisp}")


def test_render_ndc_wrapper_golden(ref_run, ref_helpers, rng):
    """The reference's render() wrapper with ndc=True (run.py:1672-1748:
    viewdirs from WORLD dirs, then ndc_rays reparam with near-plane 1,
    then near/far=0/1 packing) vs our make_render_fn on the no_ndc=False
    path — the NDC *training* wiring. Coarse-only (N_importance=0: no
    chaotic resampling), f64 fields, rays f32-exact so the reference's
    internal .float() casts are lossless."""
    import sys as _sys
    from pathlib import Path
    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from convert_ref_ckpt import torch_nerf_to_flax

    import jax
    from gbnerf_tpu.config import Config, FieldConfig, RenderConfig
    from gbnerf_tpu.core.fields import NeRFMLP
    from gbnerf_tpu.core.rays import get_rays
    from gbnerf_tpu.train.step import make_render_fn

    multires, multires_views = 4, 2
    D, W_net, skip = 2, 32, 0
    torch.manual_seed(5)
    coarse = ref_helpers.NeRF(
        D=D, W=W_net, input_ch=3 * (1 + 2 * multires),
        input_ch_views=3 * (1 + 2 * multires_views), skips=[skip],
        use_viewdirs=True).double()
    embed_fn, _ = ref_helpers.get_embedder(multires, 0)
    embeddirs_fn, _ = ref_helpers.get_embedder(multires_views, 0)

    def nqf(inputs, viewdirs, fn):
        return ref_run.run_network(inputs, viewdirs, fn, embed_fn,
                                   embeddirs_fn, netchunk=1 << 16)

    # forward-facing LLFF-style pose (−z forward), slight rotation
    H, W, focal = 8, 10, 9.0
    th = 0.08
    c2w = np.array([[np.cos(th), 0, np.sin(th), 0.05],
                    [0, 1, 0, -0.02],
                    [-np.sin(th), 0, np.cos(th), 0.1]])

    jax.config.update("jax_enable_x64", True)
    try:
        ro, rd = get_rays(H, W, focal, jnp.asarray(c2w))
        # f32-exact values → the reference's .float() casts are lossless
        ro = np.asarray(ro).astype(np.float32).astype(np.float64).reshape(-1, 3)
        rd = np.asarray(rd).astype(np.float32).astype(np.float64).reshape(-1, 3)

        # render() hard-casts rays/viewdirs with .float() (run.py:1721-1736);
        # inputs are f32-exact, so no-op the cast to keep the pipeline f64.
        orig_float = torch.Tensor.float
        torch.Tensor.float = lambda self: self
        try:
            with torch.no_grad():
                rgb_r, disp_r, acc_r, depth_r, extras = ref_run.render(
                    H, W, focal, chunk=1 << 16,
                    rays=(torch.from_numpy(ro), torch.from_numpy(rd)),
                    ndc=True, near=0.0, far=1.0, use_viewdirs=True,
                    network_fn=coarse, network_query_fn=nqf, N_samples=17,
                    N_importance=0, network_fine=None, perturb=0.0,
                    raw_noise_std=0.0, lindisp=False, white_bkgd=False)
        finally:
            torch.Tensor.float = orig_float

        cfg = Config(
            field=FieldConfig(no_tcnn=True, netdepth=D, netwidth=W_net,
                              multires=multires,
                              multires_views=multires_views),
            render=RenderConfig(no_ndc=False, N_samples=17, N_importance=0,
                                perturb=0.0, raw_noise_std=0.0,
                                lindisp=False, white_bkgd=False),
        )
        mlp = NeRFMLP(depth=D, width=W_net, skips=(skip,), multires=multires,
                      multires_views=multires_views, use_viewdirs=True,
                      compute_dtype=jnp.float64)
        params = {"coarse": jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64),
            torch_nerf_to_flax(coarse.state_dict()))}
        render = make_render_fn(cfg, mlp, None, 2.0, 6.0, hwf=(H, W, focal))
        out = render(params, jnp.asarray(ro), jnp.asarray(rd), None,
                     train=False)
        out = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if x is not None else None, out)
    finally:
        jax.config.update("jax_enable_x64", False)

    np.testing.assert_allclose(out.rgb, t2n(rgb_r), atol=1e-5)
    np.testing.assert_allclose(out.depth, t2n(depth_r), atol=1e-5)
    np.testing.assert_allclose(out.acc, t2n(acc_r), atol=1e-5)
    np.testing.assert_allclose(out.weights, t2n(extras["weights"]),
                               atol=1e-5)
    np.testing.assert_allclose(out.z_vals, t2n(extras["z_vals"]), atol=1e-6)
    r_disp, g_disp = t2n(disp_r), out.disp
    keep = r_disp < 1e9   # both sides hit their caps on empty rays
    np.testing.assert_allclose(g_disp[keep], r_disp[keep], rtol=1e-5)


def test_scale_shift_and_gradient_loss_golden(ref_run, rng):
    """Depth-alignment losses vs the reference: compute_scale_and_shift
    (run.py:80-100, per-image LSQ with the det=0 guard) and gradient_loss
    (run.py:161-194, masked gradient consistency + image-based reduction),
    including an all-masked-out image exercising both degenerate paths."""
    from gbnerf_tpu.train.losses import (compute_scale_and_shift,
                                         gradient_loss)

    B, H, W = 3, 6, 7
    pred = rng.standard_normal((B, H, W)).astype(np.float32)
    tgt = rng.standard_normal((B, H, W)).astype(np.float32)
    mask = (rng.random((B, H, W)) > 0.3).astype(np.float32)
    mask[2] = 0.0                      # det=0 / M=0 degenerate image

    pt, tt, mt = map(torch.from_numpy, (pred, tgt, mask))
    s_ref, t_ref = ref_run.compute_scale_and_shift(pt, tt, mt)
    s, t = compute_scale_and_shift(jnp.asarray(pred), jnp.asarray(tgt),
                                   jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(s), t2n(s_ref), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), t2n(t_ref), rtol=1e-5,
                               atol=1e-6)

    gl_ref = float(ref_run.gradient_loss(pt, tt, mt))
    gl = float(jnp.mean(gradient_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                      jnp.asarray(mask))))
    np.testing.assert_allclose(gl, gl_ref, rtol=1e-5)


def test_load_colmap_depth_golden(ref_llff, tmp_path, rng):
    """Sparse COLMAP depth supervision end-to-end vs the reference
    (load_llff.py:467-518): same sparse model + poses_bounds must produce
    identical per-train-image {depth, coord, weight} lists, including the
    reference's quirks our loader intentionally mirrors — keypoints from
    image id k+40 but pose/bounds from index k, the 2·exp(−(err/ē)²)
    weights, the [near,far] depth filter, and coord/factor scaling."""
    import imageio.v2 as imageio

    from gbnerf_tpu.data import colmap as oc
    from gbnerf_tpu.data.llff import load_colmap_depth

    base = str(tmp_path / "scene")
    n_img, n_pts, f = 43, 12, 4
    sparse0 = os.path.join(base, "sparse", "0")
    os.makedirs(sparse0)
    os.makedirs(os.path.join(base, "images"))
    os.makedirs(os.path.join(base, f"images_{f}", "label"), exist_ok=True)

    # Ring of cameras looking at the origin; points near the origin so
    # depths land inside the bounds, plus one far point that must filter.
    cams = {1: oc.Camera(id=1, model="SIMPLE_RADIAL", width=20, height=16,
                         params=np.array([18.0, 10.0, 8.0, 0.0]))}
    images, points = {}, {}
    pb = []
    for i in range(1, n_img + 1):
        th = 2 * np.pi * i / n_img
        c = np.array([4 * np.sin(th), 0.3 * np.cos(3 * th), 4 * np.cos(th)])
        z = -c / np.linalg.norm(c)                  # COLMAP +z forward
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w_R = np.stack([x, y, z], 1)
        R = c2w_R.T
        t = -R @ c
        images[i] = oc.Image(
            id=i, qvec=oc.rotmat2qvec(R), tvec=t, camera_id=1,
            name=f"im_{i:03d}.jpg",
            xys=rng.uniform(0, 16, size=(n_pts + 1, 2)),
            point3D_ids=np.concatenate(
                [np.arange(1, n_pts + 1), [-1]]).astype(np.int64))
        pose35 = np.concatenate(
            [np.stack([-y, x, z], 1), c[:, None],
             np.array([[16.0], [20.0], [18.0]])], 1)
        pb.append(np.concatenate([pose35.ravel(), [2.0, 6.0]]))
        imageio.imwrite(os.path.join(base, "images", f"im_{i:03d}.jpg"),
                        (rng.random((16, 20, 3)) * 255).astype(np.uint8))
        imageio.imwrite(
            os.path.join(base, f"images_{f}", f"im_{i:03d}.jpg"),
            (rng.random((4, 5, 3)) * 255).astype(np.uint8))
        imageio.imwrite(
            os.path.join(base, f"images_{f}", "label", f"im_{i:03d}.png"),
            (255 * (rng.random((4, 5)) > 0.5)).astype(np.uint8))
    np.save(os.path.join(base, "poses_bounds.npy"),
            np.stack(pb).astype(np.float64))

    for p in range(1, n_pts + 1):
        xyz = (rng.normal(size=3) * 0.3 if p < n_pts
               else np.array([0.0, 0.0, 9.0]))     # far outlier → filtered
        points[p] = oc.Point3D(
            id=p, xyz=xyz, rgb=(rng.random(3) * 255).astype(np.uint8),
            error=float(rng.random()) + 0.1,
            image_ids=np.arange(1, n_img + 1, dtype=np.int64),
            point2D_idxs=np.full(n_img, p - 1, np.int64))
    oc.write_model(cams, images, points, sparse0, ext=".bin")

    ref_list = ref_llff.load_colmap_depth(base, factor=f, bd_factor=0.75)
    got_list = load_colmap_depth(base, factor=f, bd_factor=0.75)

    assert len(got_list) == len(ref_list) == n_img - 40
    for got, ref in zip(got_list, ref_list):
        np.testing.assert_allclose(got["depth"], ref["depth"], rtol=1e-5)
        np.testing.assert_allclose(got["coord"], ref["coord"], rtol=1e-6)
        np.testing.assert_allclose(got["weight"], ref["weight"], rtol=1e-5)


@pytest.fixture(scope="module")
def ref_pose_utils():
    """Import the reference's llff.poses.pose_utils (skimage isn't in the
    image — stub skimage.transform, which only minify_v0 touches)."""
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.transform = types.ModuleType("skimage.transform")
        sys.modules["skimage"] = sk
        sys.modules["skimage.transform"] = sk.transform
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from llff.poses import pose_utils  # noqa: E402
    return pose_utils


def test_colmap_to_poses_bounds_golden(ref_pose_utils, tmp_path, rng):
    """Offline COLMAP→poses_bounds conversion end-to-end vs the reference
    (pose_utils.py:11-88 load_colmap_data + save_poses): same sparse model
    (written with OUR binary writers, read by the reference's parser) must
    produce byte-identical poses_bounds rows — column permutation, w2c
    inversion, per-image 0.5/99.5 depth percentiles, name-sorted order."""
    from gbnerf_tpu.data import colmap as ours
    from gbnerf_tpu.data.pose_utils import colmap_to_poses_bounds

    base = str(tmp_path / "scene")
    sparse0 = os.path.join(base, "sparse", "0")
    os.makedirs(sparse0)

    # 4 images (ids 1..N as COLMAP emits; names deliberately NOT in id
    # order to exercise the name-sort), 6 points, full visibility.
    cams = {1: ours.Camera(id=1, model="SIMPLE_RADIAL", width=64, height=48,
                           params=np.array([50.0, 32.0, 24.0, 0.01]))}
    n_img, n_pts = 4, 6
    images, points = {}, {}
    for i in range(1, n_img + 1):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        images[i] = ours.Image(
            id=i, qvec=q, tvec=rng.normal(size=3) + [0, 0, 4.0], camera_id=1,
            name=f"im_{(7 * i) % n_img}.jpg",
            xys=rng.uniform(0, 48, size=(n_pts, 2)),
            point3D_ids=np.arange(1, n_pts + 1, dtype=np.int64))
    for p in range(1, n_pts + 1):
        points[p] = ours.Point3D(
            id=p, xyz=rng.normal(size=3) * 0.5,
            rgb=(rng.random(3) * 255).astype(np.uint8),
            error=float(rng.random()),
            image_ids=np.arange(1, n_img + 1, dtype=np.int64),
            point2D_idxs=np.full(n_img, p - 1, np.int64))
    ours.write_model(cams, images, points, sparse0, ext=".bin")

    r_poses, r_pts3d, r_perm = ref_pose_utils.load_colmap_data(base)
    ref_pose_utils.save_poses(base, r_poses, r_pts3d, r_perm)
    ref_rows = np.load(os.path.join(base, "poses_bounds.npy"))

    rows = colmap_to_poses_bounds(base)
    assert rows.shape == ref_rows.shape == (n_img, 17)
    np.testing.assert_allclose(rows, ref_rows, rtol=1e-10, atol=1e-12)


# ---------------------------------------------------------------------------
# Assembled-loss goldens (VERDICT r2 #3): the LOSS ASSEMBLY, not just the
# unit seams — per-term values and the weighted totals, in f64 on identical
# converted weights and identical ray batches.
# ---------------------------------------------------------------------------

def _loss_golden_setup(ref_helpers, ref_run, rng, *, NI):
    """Shared fixture: converted tiny coarse+fine MLPs (f64), three ray
    streams (clf/inp), reference render_rays outputs per stream."""
    import sys as _sys
    from pathlib import Path
    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from convert_ref_ckpt import torch_nerf_to_flax

    from gbnerf_tpu.core.fields import NeRFMLP

    multires, multires_views = 4, 2
    D, W, skip = 2, 32, 0
    in_ch = 3 * (1 + 2 * multires)
    in_ch_views = 3 * (1 + 2 * multires_views)
    torch.manual_seed(11)
    coarse = ref_helpers.NeRF(D=D, W=W, input_ch=in_ch,
                              input_ch_views=in_ch_views, skips=[skip],
                              use_viewdirs=True).double()
    fine = ref_helpers.NeRF(D=D, W=W, input_ch=in_ch,
                            input_ch_views=in_ch_views, skips=[skip],
                            use_viewdirs=True).double()
    embed_fn, _ = ref_helpers.get_embedder(multires, 0)
    embeddirs_fn, _ = ref_helpers.get_embedder(multires_views, 0)

    def nqf(inputs, viewdirs, fn):
        return ref_run.run_network(inputs, viewdirs, fn, embed_fn,
                                   embeddirs_fn, netchunk=1 << 16)

    N, NS = 20, 17
    near, far = 0.5, 4.0

    def stream(seed, finite_disp=False):
        r = np.random.default_rng(seed)
        o = r.standard_normal((N, 3))
        d = r.standard_normal((N, 3)) * r.uniform(0.5, 1.5, (N, 1))
        v = d / np.linalg.norm(d, axis=-1, keepdims=True)
        rb = np.concatenate(
            [o, d, np.full((N, 1), near), np.full((N, 1), far), v], -1)
        with torch.no_grad():
            ret = ref_run.render_rays(
                torch.from_numpy(rb), network_fn=coarse,
                network_query_fn=nqf, N_samples=NS, N_importance=NI,
                network_fine=fine if NI else None, perturb=0.0,
                raw_noise_std=0.0, white_bkgd=False, lindisp=False,
                pytest=False)
        if finite_disp:
            # a disparity-supervised stream needs rays that actually hit
            # density: the reference's disp is 0/0 = NaN on empty rays and
            # we clamp at 1/z_near there (documented divergence,
            # core/render.py) — real inp streams sample real scenes, so
            # the golden compares on the physically meaningful subset.
            # Rays are independent in render_rays: dropping rows leaves
            # the kept rows' values unchanged.
            disp = ret["disp_map"].numpy()
            keep = np.isfinite(disp) & (disp < 0.99 / near)
            assert keep.sum() >= 8, f"only {keep.sum()} non-empty rays"
            o, d = o[keep], d[keep]
            ret = {k: (v[torch.from_numpy(keep)]
                       if torch.is_tensor(v) and v.shape[:1] == (N,) else v)
                   for k, v in ret.items()}
        return o, d, ret

    import jax
    mlp = NeRFMLP(depth=D, width=W, skips=(skip,), multires=multires,
                  multires_views=multires_views, use_viewdirs=True,
                  compute_dtype=jnp.float64)
    to64 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jnp.asarray(np.asarray(x), jnp.float64), t)
    params = {"coarse": to64(torch_nerf_to_flax(coarse.state_dict()))}
    if NI:
        params["fine"] = to64(torch_nerf_to_flax(fine.state_dict()))
    return dict(mlp=mlp, params=params, stream=stream, NS=NS, NI=NI,
                near=near, far=far, img2mse=ref_helpers.img2mse)


def test_stage1_loss_assembly_golden(ref_run, ref_helpers, rng):
    """Stage-1 assembled loss vs the reference's expressions
    (run.py:1470-1478) term by term at f64. Divergences (documented at the
    loss site, train/step.py) verified here:
      * the reference branch is UNRUNNABLE as shipped — run.py:1366 unpacks
        6 values from the 5-tuple render() returns (asserted below);
      * as written, :1476 scores the CLF-render disparity against the INP
        stream's targets (unrelated rays); we score the inp render against
        its own targets — the golden checks our term equals the reference
        PRIMITIVE (img2mse of ref-rendered disp) applied to matched rays;
      * our coarse rgb0 term (reference stage-2 has it at :1514, its
        stage-1 as written does not) enters the total with weight 1.
    """
    import inspect
    import jax

    from gbnerf_tpu.config import Config, DataConfig, FieldConfig, RenderConfig
    from gbnerf_tpu.train.step import make_train_step_stage1

    # the reference's own stage-1 render line cannot execute: 6-way unpack
    # of a 5-element return (render() run.py:1745-1748)
    src = inspect.getsource(ref_run.render)
    assert "return ret_list + [ret_dict]" in src
    assert len(ref_run.render.__doc__ or "x") > 0  # render is the 5-tuple fn

    jax.config.update("jax_enable_x64", True)
    try:
        s = _loss_golden_setup(ref_helpers, ref_run, rng, NI=9)
        img2mse = s["img2mse"]
        o_c, d_c, ret_c = s["stream"](101)   # clf stream
        o_i, d_i, ret_i = s["stream"](202, finite_disp=True)
        r = np.random.default_rng(303)
        target_clf = r.random((20, 3))
        target_inp = r.random((len(o_i), 1))

        depth_lambda = 0.1
        cfg = Config(
            field=FieldConfig(no_tcnn=True, netdepth=2, netwidth=32),
            render=RenderConfig(no_ndc=True, N_samples=s["NS"],
                                N_importance=s["NI"], perturb=0.0,
                                raw_noise_std=0.0, lindisp=False,
                                white_bkgd=False),
            data=DataConfig(depth_lambda=depth_lambda, colmap_depth=False),
        )
        step = make_train_step_stage1(cfg, s["mlp"], s["mlp"], s["near"],
                                      s["far"])
        batches = {
            "clf": {"o": jnp.asarray(o_c), "d": jnp.asarray(d_c),
                    "target": jnp.asarray(target_clf)},
            "inp": {"o": jnp.asarray(o_i), "d": jnp.asarray(d_i),
                    "target": jnp.asarray(target_inp)},
        }
        loss, metrics = step.loss_fn(s["params"], batches,
                                     jax.random.PRNGKey(0))

        with torch.no_grad():
            ref_img = img2mse(ret_c["rgb_map"],
                              torch.from_numpy(target_clf)).item()
            ref_img0 = img2mse(ret_c["rgb0"],
                               torch.from_numpy(target_clf)).item()
            # matched-stream depth term (the DS-NeRF intent), assembled
            # from the reference's own primitives
            ref_depth = img2mse(ret_i["disp_map"],
                                torch.from_numpy(target_inp[:, 0])).item()

        np.testing.assert_allclose(float(metrics["img_loss"]), ref_img,
                                   rtol=1e-6)
        np.testing.assert_allclose(float(metrics["depth_loss"]), ref_depth,
                                   rtol=1e-6)
        np.testing.assert_allclose(
            float(loss), ref_img + ref_img0 + depth_lambda * ref_depth,
            rtol=1e-6)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_stage2_loss_assembly_golden(ref_run, ref_helpers, rng):
    """Stage-2 (guidance-off) assembled loss vs the reference's LIVE
    assembly (run.py:1483-1515): img2mse(rgb2, target_clf) + depth_lambda ·
    img2mse(disp2, target_inp) + img_loss0, per-term and total, f64,
    identical converted weights and ray batches. The SDS term is exercised
    by the guidance goldens; here sds_loss_weight scales a zero (guidance
    off), matching a reference run with sds_loss_weight=0.
    Divergence, documented (train/step.py): our optional stage-2 COLMAP
    term is exercised OFF here — the reference's second_stage never samples
    its depth bank (run.py:1305-1359)."""
    import jax

    from gbnerf_tpu.config import Config, DataConfig, FieldConfig, RenderConfig
    from gbnerf_tpu.train.step import Stage2Batch, make_train_step_stage2

    jax.config.update("jax_enable_x64", True)
    try:
        s = _loss_golden_setup(ref_helpers, ref_run, rng, NI=9)
        img2mse = s["img2mse"]
        o_c, d_c, ret_c = s["stream"](404)
        o_i, d_i, ret_i = s["stream"](505, finite_disp=True)
        r = np.random.default_rng(606)
        target_clf = r.random((20, 3))
        target_inp = r.random((len(o_i), 1))

        depth_lambda = 0.1
        cfg = Config(
            field=FieldConfig(no_tcnn=True, netdepth=2, netwidth=32),
            render=RenderConfig(no_ndc=True, N_samples=s["NS"],
                                N_importance=s["NI"], perturb=0.0,
                                raw_noise_std=0.0, lindisp=False,
                                white_bkgd=False),
            data=DataConfig(depth_lambda=depth_lambda, colmap_depth=False),
        )
        H, W = 8, 10
        step = make_train_step_stage2(cfg, s["mlp"], s["mlp"], s["near"],
                                      s["far"], (H, W, 9.0))
        batch = Stage2Batch(
            image=jnp.zeros((H, W, 3)), mask=jnp.zeros((H, W)),
            coords=jnp.zeros((4, 2), jnp.int32),
            valid=jnp.zeros((4,), bool),
            pose=jnp.asarray(np.eye(3, 4)),
            clf={"o": jnp.asarray(o_c), "d": jnp.asarray(d_c),
                 "target": jnp.asarray(target_clf)},
            inp={"o": jnp.asarray(o_i), "d": jnp.asarray(d_i),
                 "target": jnp.asarray(target_inp)},
            depth=None)
        loss, metrics = step.loss_fn(s["params"], batch, 0,
                                     jax.random.PRNGKey(0))

        with torch.no_grad():
            ref_img = img2mse(ret_c["rgb_map"],
                              torch.from_numpy(target_clf)).item()
            ref_img0 = img2mse(ret_c["rgb0"],
                               torch.from_numpy(target_clf)).item()
            ref_depth = img2mse(ret_i["disp_map"],
                                torch.from_numpy(target_inp[:, 0])).item()

        np.testing.assert_allclose(float(metrics["img_loss"]), ref_img,
                                   rtol=1e-6)
        np.testing.assert_allclose(float(metrics["depth_loss"]), ref_depth,
                                   rtol=1e-6)
        assert float(metrics["sds_loss"]) == 0.0
        np.testing.assert_allclose(
            float(loss), ref_img + ref_img0 + depth_lambda * ref_depth,
            rtol=1e-6)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_csd_combine_weight_surface_golden(rng):
    """Per-modality 3-way CSD/BSD combine == the reference's combine lines
    (sd_utils.py:493-496, executed verbatim in torch) under the reference's
    SHIPPED per-modality triples (run.py:503-508: rgb 8.5/7.5/0.5, normal
    2.5/1.5/0.5), the collaborative combine == :690 with the shared triple
    (run.py:511-513), and the GuidanceConfig defaults pinned to the
    reference parser defaults — so loading a shipped config (which sets
    none of these flags) runs the identical weight surface (VERDICT r3 #1).
    """
    from gbnerf_tpu.config import GuidanceConfig
    from gbnerf_tpu.guidance.sds import cfg_combine_bsd, cfg_combine_colla

    g = GuidanceConfig()
    # reference parser defaults (run.py:502-515)
    assert g.use_csd is False            # --use_csd store_true (run.py:502)
    assert (g.rgb_w1, g.rgb_w2, g.rgb_w3) == (8.5, 7.5, 0.5)
    assert (g.normal_w1, g.normal_w2, g.normal_w3) == (2.5, 1.5, 0.5)
    assert (g.w1, g.w2, g.w3) == (8.5, 7.5, 0.5)
    assert g.use_negative == 0           # run.py:515
    assert g.lambda_guidance == 1.0      # run.py:458
    assert g.guidance_scale == 7.5       # --rgb_guidance_scale (run.py:468)
    # parser default (run.py:464); aconfig_1.txt:20 sets an EXPLICIT 1.5,
    # so shipped-config loads still run 1.5 (test_config pins that side)
    assert g.normal_guidance_scale == 7.5

    noise_pred = torch.from_numpy(
        rng.standard_normal((3, 4, 8, 8)).astype(np.float32))
    e_null, e_unc, e_txt = (jnp.asarray(noise_pred[i].numpy())
                            for i in range(3))

    for w1, w2, w3 in [(g.rgb_w1, g.rgb_w2, g.rgb_w3),
                       (g.normal_w1, g.normal_w2, g.normal_w3)]:
        # sd_utils.py:494-496 verbatim (chunk order: null, uncond, text)
        noise_pred_null, noise_pred_uncond, noise_pred_text = \
            noise_pred.chunk(3)
        ref = (w1 * noise_pred_text + w3 * noise_pred_null
               - w2 * noise_pred_uncond)
        got = cfg_combine_bsd(e_null, e_unc, e_txt, w1, w2, w3)
        np.testing.assert_allclose(np.asarray(got), t2n(ref)[0], rtol=1e-6,
                                   atol=1e-6)

    # collaborative combine, sd_utils.py:690 verbatim, shared w1/w2
    noise_pred_null, noise_pred_uncond, noise_pred_text = noise_pred.chunk(3)
    ref_colla = (g.w1 * noise_pred_text + (g.w2 - g.w1) * noise_pred_null
                 - g.w2 * noise_pred_uncond)
    got_colla = cfg_combine_colla(e_null, e_unc, e_txt, g.w1, g.w2)
    np.testing.assert_allclose(np.asarray(got_colla), t2n(ref_colla)[0],
                               rtol=1e-6, atol=1e-6)
