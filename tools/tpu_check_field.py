"""TPU: fused field vs XLA oracle parity + integrated bench."""
import json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from gbnerf_tpu.core.cp_field import CPGridField

key = jax.random.PRNGKey(0)
model_f = CPGridField(bound=2.0, fused=True)
model_x = CPGridField(bound=2.0, fused=False)
pts = jax.random.uniform(key, (4096, 3), minval=-2.0, maxval=2.0)
dirs = jax.random.normal(jax.random.fold_in(key, 1), (4096, 3))
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
params = model_f.init(key, pts[:8], dirs[:8])["params"]

out_f = jax.jit(lambda p: model_f.apply({"params": p}, pts, dirs))(params)
out_x = jax.jit(lambda p: model_x.apply({"params": p}, pts, dirs))(params)
err = float(jnp.max(jnp.abs(out_f - out_x)))
scale = float(jnp.max(jnp.abs(out_x)))
print(json.dumps({"check": "fused_vs_xla_unfused_maxerr", "err": err, "scale": scale}))

# grad flows through fused (custom_vjp oracle)
g = jax.jit(jax.grad(lambda p: jnp.sum(
    model_f.apply({"params": p}, pts[:512], dirs[:512]) ** 2)))(params)
gmax = max(float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g))
print(json.dumps({"check": "fused_grad_max", "gmax": gmax}))

# sigma_only matches full sigma
out_s = jax.jit(lambda p: model_f.apply(
    {"params": p}, pts, dirs, sigma_only=True))(params)
err_s = float(jnp.max(jnp.abs(out_s[..., 3] - out_f[..., 3])))
print(json.dumps({"check": "sigma_only_maxerr", "err": err_s}))
