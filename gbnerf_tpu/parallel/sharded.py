"""Mesh-sharded train / render steps (multi-chip data parallelism).

The reference's multi-GPU story is nn.DataParallel scatter/gather over the
ray batch (/root/reference/run.py:2146,2158). TPU-native replacement: params
replicated, ray batches sharded on the leading axis over the mesh's ``data``
axis; `jax.jit` with explicit NamedShardings compiles one SPMD program where
XLA inserts the gradient all-reduce over ICI. The same step runs 1-chip or
N-chip — only the shardings change.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..train.state import TrainState, make_optimizer
from ..train.step import make_render_fn
from ..utils.metrics import img2mse, mse2psnr, weighted_mse


def make_sharded_train_step(cfg: Config, coarse_model, fine_model,
                            near: float, far: float, mesh: Mesh,
                            axis: str = "data", hwf=None):
    """Stage-1 (DS-NeRF) train step, SPMD over the mesh.

    The returned step takes pre-assembled per-iteration batches
    ({"clf": {o,d,target}, "inp": ..., "depth": ...}) whose leading axis is
    sharded; state is replicated. Gradient cross-replica mean comes from the
    sharded-mean in the loss — no explicit collectives.
    """
    render = make_render_fn(cfg, coarse_model, fine_model, near, far,
                            hwf=hwf)
    tx = make_optimizer(cfg)
    d = cfg.data

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    def loss_fn(params, batch, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        clf = batch["clf"]
        out = render(params, clf["o"], clf["d"], k1, train=True)
        img_loss = img2mse(out.rgb, clf["target"])
        loss = img_loss
        if out.rgb0 is not None:
            loss = loss + img2mse(out.rgb0, clf["target"])
        if batch.get("inp") is not None:
            o2 = render(params, batch["inp"]["o"], batch["inp"]["d"], k2,
                        train=True)
            loss = loss + d.depth_lambda * img2mse(
                o2.disp, batch["inp"]["target"][:, 0])
        if batch.get("depth") is not None:
            o3 = render(params, batch["depth"]["o"], batch["depth"]["d"], k3,
                        train=True)
            loss = loss + d.sdepth_lambda * weighted_mse(
                o3.depth, batch["depth"]["target"][:, 0],
                batch["depth"]["target"][:, 1])
        return loss, {"img_loss": img_loss, "psnr": mse2psnr(img_loss)}

    def _step(state: TrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        metrics["loss"] = loss
        return TrainState(state.step + 1, params, opt_state), metrics

    def shardings_like(tree, s):
        return jax.tree_util.tree_map(lambda _: s, tree)

    def jit_step(state_example, batch_example):
        return jax.jit(
            _step,
            in_shardings=(
                shardings_like(state_example, repl),
                shardings_like(batch_example, shard),
                repl,
            ),
            out_shardings=(
                shardings_like(state_example, repl),
                None,
            ),
            donate_argnums=(0,),
        )

    return _step, jit_step, (repl, shard)


def make_sharded_renderer(cfg: Config, coarse_model, fine_model,
                          near: float, far: float, mesh: Mesh,
                          axis: str = "data", hwf=None):
    """Eval renderer with the ray axis sharded over the mesh.

    Full-image renders shard pixels; the host sees one global array
    (all-gather is implicit in the output sharding → host fetch).
    """
    render = make_render_fn(cfg, coarse_model, fine_model, near, far,
                            hwf=hwf)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    @jax.jit
    def render_flat(params, rays_o, rays_d):
        rays_o = jax.lax.with_sharding_constraint(rays_o, shard)
        rays_d = jax.lax.with_sharding_constraint(rays_d, shard)
        out = render(params, rays_o, rays_d, None, train=False)
        return {"rgb": out.rgb, "disp": out.disp, "depth": out.depth}

    return render_flat
