"""Round-4: whole-frame direct correlate at tv=1024/4096 (64x1M).

The first A/B's complex rows ran the pre-guard ragged-pad program (wrong
values -> struck); these re-measure the two crossover-setting rows on the
shipped whole-frame spelling. Run serially.
"""

import sys, time, traceback
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
assert jax.default_backend() == "tpu"
from digital_signal_processsing_tpu.ops import correlate as C

rng = np.random.default_rng(5)
B, T = 64, 1 << 20
ar = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
ai = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)

def k_diff(name, make, x, work, klo=2, khi=6, reps=3):
    fns = {}
    for k in (klo, khi):
        f = make(k)
        t0 = time.perf_counter()
        np.asarray(f(x))
        print(f"  compiled {name} k={k}: {time.perf_counter()-t0:.1f}s", flush=True)
        fns[k] = f
    best = {k: float("inf") for k in fns}
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(x))
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[khi] - best[klo]) / (khi - klo)
    print(f"{name}: {work/per/1e9:.3f} GS/s (t{klo}={best[klo]:.3f}s t{khi}={best[khi]:.3f}s)", flush=True)

def make_cc(tv):
    vr = jnp.asarray(rng.standard_normal(tv), jnp.float32)
    vi = jnp.asarray(rng.standard_normal(tv), jnp.float32)
    def mk(k):
        @jax.jit
        def chained(arg):
            x, y = arg
            def body(i, acc):
                fr, fi = C.correlate_complex(
                    x + i.astype(jnp.float32) * 1e-12, y, vr, vi, "valid",
                    method="direct")
                return acc + jnp.sum(jnp.abs(fr[..., :8])) + jnp.sum(jnp.abs(fi[..., :8]))
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
        return chained
    return mk

for tv in (1024, 4096):
    try:
        k_diff(f"cc tv={tv} direct wholeframe (64x1M)", make_cc(tv), (ar, ai), B * T)
    except Exception:
        print(f"CRASH tv={tv}", flush=True)
        traceback.print_exc()
print("DONE", flush=True)
