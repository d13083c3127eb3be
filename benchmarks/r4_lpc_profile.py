"""Where do lpc_synthesis_pallas's 16.7 ms go? passes vs compose vs transposes."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
assert jax.default_backend() == "tpu"
from digital_signal_processsing_tpu.ops import lpc

rng = np.random.default_rng(7)
S, F, L, p = 128, 512, 256, 12
a = np.concatenate([np.ones((S, F, 1), np.float32),
                    rng.uniform(-0.25, 0.25, (S, F, p)).astype(np.float32)], -1)
g = rng.uniform(0.5, 2.0, (S, F)).astype(np.float32)
e = rng.standard_normal((S, F * L)).astype(np.float32)
ad, gd, ed = jnp.asarray(a), jnp.asarray(g), jnp.asarray(e)
work = S * F * L

def k_diff(name, fn, x, klo=4, khi=12, reps=3):
    fns = {}
    for k in (klo, khi):
        @jax.jit
        def chained(v, k=k, fn=fn):
            def body(i, acc):
                out = fn(v + i.astype(jnp.float32) * 1e-12)
                leaves = jax.tree_util.tree_leaves(out)
                return acc + sum(jnp.sum(jnp.abs(l).ravel()[:4]) for l in leaves)
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
        t0 = time.perf_counter()
        np.asarray(chained(x))
        print(f"  compiled {name} k={k}: {time.perf_counter()-t0:.1f}s", flush=True)
        fns[k] = chained
    best = {k: float("inf") for k in fns}
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(x))
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[khi] - best[klo]) / (khi - klo)
    print(f"{name}: {per*1e3:.2f} ms/iter ({work/per/1e9:.3f} GS/s-equiv)", flush=True)

ft = S * F
fpad = -(-ft // 1024) * 1024
r = fpad // 128

def to_tiles(v, k):
    flat = v.reshape(ft, k)
    flat = jnp.pad(flat, ((0, fpad - ft), (0, 0)))
    return flat.T.reshape(k, r, 128)

eg = (ed.reshape(S, F, L) * gd[..., None])
e_t0 = to_tiles(eg, L)
zeros_t = jnp.zeros((p, r, 128), jnp.float32)
a_t0 = to_tiles(ad[..., 1:], p)

k_diff("transpose e only", lambda v: to_tiles(v.reshape(S, F, L), L), ed)
k_diff("pass alone (pre-tiled, zero seed)",
       lambda v: lpc._lpc_synth_pass(a_t0, zeros_t, e_t0 + v.ravel()[0] * 0, bt=lpc._LPC_BT)[0], ed)
def compose_only(v):
    A = lpc._companion(ad + v.ravel()[0] * 0)
    M = lpc._matrix_power(A, L)
    z = jnp.zeros_like(M[..., 0])
    def comp(lft, rgt):
        m1, z1 = lft
        m2, z2 = rgt
        return m2 @ m1, jnp.einsum("...ij,...j->...i", m2, z1) + z2
    Mi, zi = jax.lax.associative_scan(comp, (M, z), axis=1)
    return zi
k_diff("Mpower+compose alone", compose_only, ed)
k_diff("full pallas", lambda v: lpc.lpc_synthesis(ad, gd, v, L, method="pallas"), ed)
print("DONE", flush=True)
