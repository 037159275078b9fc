"""Train state: coarse/fine field params + Adam with exponential LR decay.

Parity targets:
  - model creation create_nerf / create_nerf_tcnn (/root/reference/
    run.py:2003-2232): coarse + fine field of identical architecture,
    single Adam over both.
  - LR schedule (/root/reference/run.py:1542-1546):
    lr(step) = lrate · 0.1^(step / (lrate_decay·1000)).

TPU-first: state is one pytree (params ⊕ opt-state ⊕ step) so the whole
update lives in a single pjit-able function, and orbax checkpoints it whole.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..core.fields import HashGridField, NeRFMLP


class TrainState(NamedTuple):
    step: jnp.ndarray          # scalar int32
    params: Any                # {"coarse": ..., "fine": ...}
    opt_state: Any


def build_field(cfg: Config, fine: bool = False) -> nn.Module:
    f = cfg.field
    dtype = jnp.bfloat16 if f.compute_dtype == "bfloat16" else jnp.float32
    if f.no_tcnn:
        return NeRFMLP(
            depth=f.netdepth_fine if fine else f.netdepth,
            width=f.netwidth_fine if fine else f.netwidth,
            multires=f.multires, multires_views=f.multires_views,
            use_viewdirs=f.use_viewdirs, compute_dtype=dtype,
        )
    if f.field_type == "hash":
        return HashGridField(
            bound=f.bound, n_levels=f.n_levels, n_features=f.n_features,
            log2_hashmap_size=f.log2_hashmap_size, base_res=f.base_res,
            compute_dtype=dtype,
        )
    from ..core.cp_field import CPGridField

    res, rank = tuple(f.cp_resolutions), f.cp_rank
    if not fine:
        # Proposal-style coarse field (see FieldConfig.cp_resolutions_coarse).
        res = tuple(f.cp_resolutions_coarse or res)
        rank = f.cp_rank_coarse or rank
    return CPGridField(bound=f.cp_bound, resolutions=res, rank=rank)


def lr_schedule(cfg: Config):
    t = cfg.train

    def schedule(step):
        return t.lrate * 0.1 ** (step / (t.lrate_decay * 1000.0))

    return schedule


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    return optax.adam(lr_schedule(cfg), b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(
    cfg: Config, rng
) -> Tuple[TrainState, nn.Module, Optional[nn.Module]]:
    """Init coarse+fine fields and the optimizer.

    Returns (state, coarse_model, fine_model); fine_model is None when
    N_importance == 0 (reference: network_fine absent → coarse reused).
    """
    coarse = build_field(cfg, fine=False)
    k1, k2 = jax.random.split(rng)
    dummy_pts = jnp.zeros((8, 3))
    dummy_dirs = jnp.ones((8, 3)) / jnp.sqrt(3.0)
    params = {"coarse": coarse.init(k1, dummy_pts, dummy_dirs)["params"]}
    fine = None
    if cfg.render.N_importance > 0:
        fine = build_field(cfg, fine=True)
        params["fine"] = fine.init(k2, dummy_pts, dummy_dirs)["params"]

    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state), coarse, fine
