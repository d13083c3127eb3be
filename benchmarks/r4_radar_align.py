"""Is the matched filter's valid-slice (start offset 127) the composition
cost? A/B: detect-as-is vs full-width doppler + tail slice of power."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
assert jax.default_backend() == "tpu"
from digital_signal_processsing_tpu.models import radar
from digital_signal_processsing_tpu.ops.correlate import correlate_complex

rng = np.random.default_rng(5)
cfg = radar.RadarConfig(n_pulses=64, n_range=1 << 20, pulse_len=128,
                        guard=(2, 4), train=(4, 16))
ri = jnp.asarray(rng.standard_normal((cfg.n_pulses, cfg.n_range)), jnp.float32)
rq = jnp.asarray(rng.standard_normal((cfg.n_pulses, cfg.n_range)), jnp.float32)
work = cfg.n_pulses * cfg.n_range
cr_, ci_ = radar._doppler_dft(cfg.n_pulses, cfg.window)
cr, ci = jnp.asarray(cr_), jnp.asarray(ci_)
pr, pi_ = radar.lfm_pulse(cfg)
prj, pij = jnp.asarray(pr), jnp.asarray(pi_)
hp = jax.lax.Precision.HIGHEST

def chain_valid(a, b):
    xr, xi = correlate_complex(a, b, prj, pij, mode="valid")
    rr = jnp.dot(cr, xr, precision=hp) - jnp.dot(ci, xi, precision=hp)
    ri2 = jnp.dot(cr, xi, precision=hp) + jnp.dot(ci, xr, precision=hp)
    return rr * rr + ri2 * ri2

def chain_full(a, b):
    xr, xi = correlate_complex(a, b, prj, pij, mode="full")
    rr = jnp.dot(cr, xr, precision=hp) - jnp.dot(ci, xi, precision=hp)
    ri2 = jnp.dot(cr, xi, precision=hp) + jnp.dot(ci, xr, precision=hp)
    p = rr * rr + ri2 * ri2
    nb = a.shape[-1] - cfg.pulse_len + 1
    return p[:, cfg.pulse_len - 1 : cfg.pulse_len - 1 + nb]

# parity
pa = np.asarray(chain_valid(ri[:, :65536], rq[:, :65536]))
pb = np.asarray(chain_full(ri[:, :65536], rq[:, :65536]))
print("valid-vs-full parity:", np.abs(pa - pb).max() / pa.max(), flush=True)

def k_diff(name, fn, klo=4, khi=12, reps=3):
    fns = {}
    for k in (klo, khi):
        @jax.jit
        def chained(arg, k=k, fn=fn):
            a, b = arg
            def body(i, acc):
                out = fn(a + i.astype(jnp.float32) * 1e-12, b)
                return acc + jnp.sum(out[..., :4])
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
        t0 = time.perf_counter()
        np.asarray(chained((ri, rq)))
        print(f"  compiled {name} k={k}: {time.perf_counter()-t0:.1f}s", flush=True)
        fns[k] = chained
    best = {k: float("inf") for k in fns}
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f((ri, rq)))
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[khi] - best[klo]) / (khi - klo)
    print(f"{name}: {per*1e3:.2f} ms/call ({work/per/1e9:.2f} GS/s)", flush=True)

k_diff("mf+doppler VALID slice", chain_valid)
k_diff("mf+doppler FULL+tail slice", chain_full)
print("DONE", flush=True)
