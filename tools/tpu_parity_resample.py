"""TPU numeric parity + speed of the rewritten resample ops vs oracle."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from gbnerf_tpu.core.sampling import sample_pdf, merge_z_vals
from gbnerf_tpu.ops.resample import sample_pdf_fast, merge_sorted_fast

key = jax.random.PRNGKey(0)
N, S = 16384, 64
zm = jnp.sort(jax.random.uniform(key, (N, S - 1)) * 4 + 1.2, axis=-1)
w = jax.random.uniform(jax.random.fold_in(key, 1), (N, S - 2))

fast = jax.jit(lambda zm, w: sample_pdf_fast(zm, w, 64, det=True))(zm, w)
orac = jax.jit(lambda zm, w: sample_pdf(zm, w, 64, det=True))(zm, w)
err = float(jnp.max(jnp.abs(fast - orac)))
print(json.dumps({"check": "sample_pdf_tpu_maxerr", "err": err}))

a = jnp.sort(jax.random.uniform(key, (N, 64)), axis=-1)
b = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 2), (N, 64)), axis=-1)
m_fast = jax.jit(merge_sorted_fast)(a, b)
m_orac = jax.jit(merge_z_vals)(a, b)
err = float(jnp.max(jnp.abs(m_fast - m_orac)))
print(json.dumps({"check": "merge_tpu_maxerr", "err": err}))

def timeit(fn, *args, reps=16, n_items=1):
    @jax.jit
    def timed(*a):
        def body(i, acc):
            return acc + fn(i, *a) * 1e-9
        return jax.lax.fori_loop(0, reps, body, 0.0)
    float(timed(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(timed(*args))
        best = min(best, time.perf_counter() - t0)
    return n_items * reps / best

def resamp(i, zm, w):
    z = sample_pdf_fast(zm + i * 1e-6, w, 64, det=True)
    return jnp.sum(merge_sorted_fast(zm, z))
r = timeit(resamp, zm, w, reps=16, n_items=N)
print(json.dumps({"component": "resample+merge_new", "M_rays_s": round(r/1e6, 3)}))
