"""Tensor parallelism for the diffusion guidance models (UNet / VAE).

The reference has no model parallelism (SURVEY.md §2.3) — its UNet runs
whole on one GPU. On a TPU slice the guidance step is the stage-2 wall-
clock floor (one 512² VAE encode fwd+bwd + one B=3 UNet forward per
modality, ~66 ms on a single v5e), and its batch axis is 1 — data
parallelism cannot shard it. The TPU-native scaling axis is the CHANNEL
dimension: shard every conv / dense kernel's output-channel dim over a
``model`` mesh axis and let XLA's SPMD partitioner (GSPMD) propagate the
activation shardings and insert the all-gathers / reduce-scatters over ICI
(the scaling-book recipe: annotate params, let the compiler place
collectives).

Sharding rules (v1 — propagation-driven, not hand-paired Megatron):
  - conv kernels  [kh, kw, in, out] → P(None, None, None, "model")
  - dense kernels [in, out]         → P(None, "model")
  - biases        [out]             → P("model")
  - norm scales/biases (GroupNorm/LayerNorm) and everything else →
    replicated. GroupNorm statistics then reduce across the sharded
    channel axis; GSPMD inserts the (cheap: 32 scalars/group) collectives.

Validated by ``dryrun_multichip`` / tests on a virtual device mesh: the
tiny-SD guidance step jits and runs under a (model,) mesh with params
actually distributed (per-device bytes ≈ total/n).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param-dict key fragments that must stay replicated even though their
# leaves look shardable (norm parameters are [C] like biases, but their
# channel axis must match the REPLICATED statistics path).
_NORM_KEYS = ("norm", "ln_", "layernorm", "groupnorm")


def _is_norm_path(path) -> bool:
    joined = "/".join(str(k.key) if hasattr(k, "key") else str(k)
                      for k in path).lower()
    return any(n in joined for n in _NORM_KEYS)


def tp_param_specs(params, n: int, axis: str = "model"):
    """PartitionSpec pytree for a flax conv-net param tree (see rules
    above). ``n`` is the mesh axis size — leaves whose out-channel dim is
    not divisible by it stay replicated, matching shard_params_tp exactly
    (both defer to _spec_for)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(path, leaf, axis, n), params)


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """device_put a param tree with out-channel sharding over ``axis``.

    Leaves whose sharded dim is not divisible by the mesh axis size fall
    back to replication (tiny test configs; real SD channels are multiples
    of 64).
    """
    n = mesh.shape[axis]

    def put(path, leaf):
        s = _spec_for(path, leaf, axis, n)
        return jax.device_put(leaf, NamedSharding(mesh, s))

    return jax.tree_util.tree_map_with_path(put, params)


def _spec_for(path, leaf, axis, n):
    if _is_norm_path(path):
        return P()
    if leaf.ndim == 4 and leaf.shape[3] % n == 0:
        return P(None, None, None, axis)
    if leaf.ndim == 2 and leaf.shape[1] % n == 0:
        return P(None, axis)
    if leaf.ndim == 1 and leaf.shape[0] % n == 0:
        return P(axis)
    return P()


def sharded_bytes_per_device(params, mesh: Mesh) -> int:
    """Max per-device param bytes (sanity metric for the dryrun)."""
    per_dev = {d: 0 for d in mesh.devices.flat}
    for leaf in jax.tree_util.tree_leaves(params):
        for shard in leaf.addressable_shards:
            per_dev[shard.device] = per_dev.get(shard.device, 0) + \
                shard.data.size * shard.data.dtype.itemsize
    return max(per_dev.values())
