"""TPU parity + speed: fused attention vs plain at SD shapes."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from gbnerf_tpu.ops.attention import self_attention, _oracle

def timeit(fn, *args, reps=16):
    @jax.jit
    def timed(*a):
        def body(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, reps, body, 0.0)
    float(timed(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(timed(*args))
        best = min(best, time.perf_counter() - t0)
    return best / reps

key = jax.random.PRNGKey(0)
for (B, H, N, D) in [(3, 8, 4096, 40), (3, 8, 1024, 80), (1, 1, 4096, 512)]:
    q = jax.random.normal(key, (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, N, D), jnp.bfloat16)
    scale = D ** -0.5

    fused = jax.jit(lambda q, k, v: self_attention(q, k, v, scale=scale))(q, k, v)
    ref = jax.jit(lambda q, k, v: _oracle(
        (q * jnp.bfloat16(scale)).reshape(B * H, N, D),
        k.reshape(B * H, N, D), v.reshape(B * H, N, D), 1.0))(q, k, v)
    err = float(jnp.max(jnp.abs(fused.reshape(B * H, N, D).astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(json.dumps({"shape": f"B{B}H{H}N{N}D{D}", "maxerr": err}), flush=True)

    def f(i, q, k, v):
        o = self_attention(q + i * jnp.bfloat16(1e-3), k, v, scale=scale)
        return jnp.sum(o.astype(jnp.float32)) * 1e-9
    t = timeit(f, q, k, v)
    print(json.dumps({"shape": f"B{B}H{H}N{N}D{D}", "fused_ms": round(t * 1e3, 3)}), flush=True)
