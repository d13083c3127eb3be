"""Doppler dot-pair precision A/B: HIGHEST vs HIGH vs DEFAULT on chip."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
assert jax.default_backend() == "tpu"
from digital_signal_processsing_tpu.models import radar

rng = np.random.default_rng(5)
cfg = radar.RadarConfig(n_pulses=64, n_range=1 << 20, pulse_len=128,
                        guard=(2, 4), train=(4, 16))
xr = jnp.asarray(rng.standard_normal((cfg.n_pulses, cfg.n_bins)), jnp.float32)
xi = jnp.asarray(rng.standard_normal((cfg.n_pulses, cfg.n_bins)), jnp.float32)
work = cfg.n_pulses * cfg.n_bins
cr_, ci_ = radar._doppler_dft(cfg.n_pulses, cfg.window)
cr, ci = jnp.asarray(cr_), jnp.asarray(ci_)

def power(prec):
    def f(a, b):
        rr = jnp.dot(cr, a, precision=prec) - jnp.dot(ci, b, precision=prec)
        ri = jnp.dot(cr, b, precision=prec) + jnp.dot(ci, a, precision=prec)
        return rr * rr + ri * ri
    return f

# parity vs float64 on a slice
pw64 = None
sl = 65536
a64 = np.asarray(xr[:, :sl], np.float64); b64 = np.asarray(xi[:, :sl], np.float64)
rr = cr_.astype(np.float64) @ a64 - ci_.astype(np.float64) @ b64
ri = cr_.astype(np.float64) @ b64 + ci_.astype(np.float64) @ a64
pw64 = rr * rr + ri * ri
for name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                   ("HIGH", jax.lax.Precision.HIGH),
                   ("DEFAULT", jax.lax.Precision.DEFAULT)]:
    got = np.asarray(power(prec)(xr[:, :sl], xi[:, :sl]))
    rel = np.abs(got - pw64).max() / pw64.max()
    print(f"{name} parity vs f64: {rel:.2e}", flush=True)

def k_diff(name, prec, klo=4, khi=12, reps=3):
    fns = {}
    for k in (klo, khi):
        @jax.jit
        def chained(arg, k=k, prec=prec):
            a, b = arg
            def body(i, acc):
                out = power(prec)(a + i.astype(jnp.float32) * 1e-12, b)
                return acc + jnp.sum(out[..., :4])
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
        t0 = time.perf_counter()
        np.asarray(chained((xr, xi)))
        print(f"  compiled {name} k={k}: {time.perf_counter()-t0:.1f}s", flush=True)
        fns[k] = chained
    best = {k: float("inf") for k in fns}
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f((xr, xi)))
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[khi] - best[klo]) / (khi - klo)
    print(f"doppler+power {name}: {per*1e3:.2f} ms/call ({work/per/1e9:.2f} GS/s-equiv)", flush=True)

for name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                   ("HIGH", jax.lax.Precision.HIGH),
                   ("DEFAULT", jax.lax.Precision.DEFAULT)]:
    k_diff(name, prec)
print("DONE", flush=True)
