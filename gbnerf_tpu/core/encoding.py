"""Input encodings: frequency (positional) encoding and spherical harmonics.

Frequency encoding matches the reference Embedder
(/root/reference/DS_NeRF/run_nerf_helpers.py:23-71): identity ⊕
{sin, cos}(2^k · x) for k = 0..multires-1 (log-sampled), output layout
[x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...].

SH encoding provides parity with tcnn's SphericalHarmonics degree-4 direction
encoding (run_nerf_helpers_tcnn.py:67-73): 16 real-SH basis values of the
direction. tcnn feeds directions mapped to [0,1]; we take unit directions
directly and document the wrapper doing (d+1)/2 → d in fields.py.

TPU-first: pure elementwise math that XLA fuses into the surrounding
matmuls; everything is static-shaped, batch-agnostic (works on [..., 3]).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def freq_encode(x, num_freqs: int, include_input: bool = True, log_sampling: bool = True):
    """γ(x): frequency-encode the last axis.

    Args:
      x: [..., D] input.
      num_freqs: number of frequency bands (reference: 10 for xyz, 4 for dirs).

    Returns:
      [..., D * (include_input + 2 * num_freqs)] encoding.
    """
    if num_freqs == 0:
        return x
    if log_sampling:
        freqs = 2.0 ** np.linspace(0.0, num_freqs - 1, num_freqs)
    else:
        freqs = np.linspace(1.0, 2.0 ** (num_freqs - 1), num_freqs)
    parts = [x] if include_input else []
    # [..., D] x [F] -> [..., F, D] -> interleave sin/cos per frequency to match
    # the reference's [sin(f0 x), cos(f0 x), sin(f1 x), ...] layout.
    xf = x[..., None, :] * jnp.asarray(freqs, dtype=x.dtype)[:, None]
    sins, coss = jnp.sin(xf), jnp.cos(xf)
    sc = jnp.stack([sins, coss], axis=-2)  # [..., F, 2, D]
    parts.append(sc.reshape(*x.shape[:-1], 2 * len(freqs) * x.shape[-1]))
    return jnp.concatenate(parts, axis=-1)


def freq_encode_dim(input_dim: int, num_freqs: int, include_input: bool = True) -> int:
    return input_dim * ((1 if include_input else 0) + 2 * num_freqs)


# Hard-coded real spherical harmonics up to degree 4 (16 coefficients),
# matching the tcnn SphericalHarmonics encoding basis used by the reference's
# direction branch. Constants are the standard real-SH normalizations.
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def sh_encode(d, degree: int = 4):
    """Real spherical-harmonics encoding of (assumed unit) directions.

    Args:
      d: [..., 3] directions.
      degree: SH degree (1..4). Degree 4 → 16 features (tcnn parity).

    Returns:
      [..., degree**2] features.
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    out = [jnp.full_like(x, _C0)]
    if degree > 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree > 3:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)
