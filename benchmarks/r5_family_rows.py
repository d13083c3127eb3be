"""On-chip end-to-end rows for the five unmeasured model families.

Round-5 VERDICT item 2: modem, OFDM, beamform/DOA, tracking and the
wideband scanner were CPU-tested and dryrun-covered but had zero measured
on-chip rows — against the repo's own "measured, not assumed" discipline
and the reference's measured-every-variant chart
(/root/reference/logs/benchmark_comparison.png, README.md:14-16).

Protocol: K-differential chaining (BENCH_NOTES Methodology) — two chained
jit lengths per config, fetch-fenced, slope = per-iteration time; per-row
crash isolation like the reference sweep's crash counting
(run_benchmarks.py:93-97). Correctness anchors print beside the rate where
the family has a discrete answer (modem BER, OFDM BER, tracking confirmed
tracks) so a fast-but-wrong row cannot pass silently.

SMOKE=1 shrinks every config for a CPU sanity pass before burning chip
time. Run serially — never in parallel with another TPU client.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
if SMOKE:
    # the axon sitecustomize registers the TPU at interpreter startup, so
    # JAX_PLATFORMS=cpu alone doesn't stick (tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
K_SMALL, K_BIG = (1, 2) if SMOKE else (4, 12)
REPEATS = 1 if SMOKE else 3
CRASHES = 0


def row(name, fn, *args):
    global CRASHES
    import traceback

    try:
        fn(name, *args)
    except Exception:
        CRASHES += 1
        print(f"CRASH {name}:", flush=True)
        traceback.print_exc()


def k_diff(name, make_fn, arg, work_items, unit="GS/s"):
    fns = {}
    for k in (K_SMALL, K_BIG):
        t0 = time.perf_counter()
        f = make_fn(k)
        np.asarray(jax.tree_util.tree_leaves(f(arg))[0].ravel()[:8])
        fns[k] = f
        print(f"  compiled {name} k={k}: {time.perf_counter()-t0:.1f}s", flush=True)
    best = {k: float("inf") for k in fns}
    for _ in range(REPEATS):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(f(arg))[0].ravel()[:8])
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[K_BIG] - best[K_SMALL]) / (K_BIG - K_SMALL)
    print(
        f"{name}: {work_items / per / 1e9:.3f} {unit} "
        f"({per*1e3:.2f} ms/iter, t{K_SMALL}={best[K_SMALL]:.3f}s "
        f"t{K_BIG}={best[K_BIG]:.3f}s)",
        flush=True,
    )


# --------------------------------------------------------------------------
# modem: 16QAM long burst — sync + equalize + phase-track + demap
# --------------------------------------------------------------------------
def modem_row():
    from digital_signal_processsing_tpu.models import modem

    cfg = modem.ModemConfig(bits_per_symbol=4, sps=8)
    n_payload = 2048 if SMOKE else 65536
    rng = np.random.default_rng(5)
    bits_tx = rng.integers(0, 2, n_payload * cfg.bits_per_symbol)
    ti, tq = modem.transmit(cfg, bits_tx)
    ci, cq = modem.channel(
        ti, tq, delay=37, cfo=2.4e-4, phase=0.8, symbol_snr_db=22.0, seed=1
    )
    i = jnp.asarray(ci)
    q = jnp.asarray(cq)
    n_samp = ci.size

    # correctness anchor (uncounted pass)
    bits_rx, diag = modem.receive(cfg, i, q, n_payload)
    ber = float(np.mean(np.asarray(bits_rx) != bits_tx))
    print(
        f"  modem anchor: BER={ber:.2e} evm={float(diag['evm']):.3f} "
        f"({n_payload} syms, {n_samp} sps-rate samples)",
        flush=True,
    )
    assert ber < 1e-3, f"modem row invalid: BER {ber}"

    def mk(k):
        @jax.jit
        def chained(arg):
            vi, vq = arg

            def body(_, c):
                yi, yq = c
                bits, diag = modem.receive(cfg, yi, yq, n_payload)
                s = 0.0 * (jnp.sum(bits.astype(jnp.float32)) + diag["evm"])
                return yi + s, yq

            return jax.lax.fori_loop(0, k, body, (vi, vq))

        return chained

    row(
        f"modem 16QAM receive ({n_payload} syms, sps=8)",
        k_diff,
        mk,
        (i, q),
        n_samp,
    )


# --------------------------------------------------------------------------
# OFDM: batched burst receive — CP sync + CFO + FFT demod + 1-tap EQ + CPE
# --------------------------------------------------------------------------
def ofdm_row():
    from digital_signal_processsing_tpu.models import ofdm

    cfg = (
        ofdm.OfdmConfig(n_fft=256, cp=64, n_symbols=8, active=192)
        if SMOKE
        else ofdm.OfdmConfig(n_fft=1024, cp=64, n_symbols=512, active=768)
    )
    batch = 2 if SMOKE else 8
    rx = ofdm.OfdmReceiver(cfg)
    rng = np.random.default_rng(7)
    bi, bq, bits_all = [], [], []
    for b in range(batch):
        bits = rng.integers(0, 2, 2 * cfg.active * cfg.n_symbols)
        ti, tq = ofdm.ofdm_modulate(cfg, bits)
        # per-burst impairments: integer delay + CFO + noise
        x = ti.astype(np.float64) + 1j * tq.astype(np.float64)
        x = np.concatenate([np.zeros(13 + b, complex), x, np.zeros(64, complex)])
        n = np.arange(x.size)
        x = x * np.exp(1j * 2 * np.pi * 1.1e-4 * n)
        x = x + 10 ** (-25 / 20) * (
            rng.standard_normal(x.size) + 1j * rng.standard_normal(x.size)
        ) / np.sqrt(2)
        pad = (13 + batch - 1) - (13 + b)  # equal lengths across the batch
        x = np.concatenate([x, np.zeros(pad, complex)])
        bi.append(x.real.astype(np.float32))
        bq.append(x.imag.astype(np.float32))
        bits_all.append(bits)
    i = jnp.asarray(np.stack(bi))
    q = jnp.asarray(np.stack(bq))
    n_samp = i.size

    def full(yi, yq):
        d, cfo = rx.synchronize(yi, yq)
        return rx.demodulate(yi, yq, d, cfo)

    # correctness anchor
    er, ei = jax.vmap(full)(i, q)
    ber = np.mean(
        [
            ofdm.qpsk_demod(np.asarray(er[b]) + 1j * np.asarray(ei[b]))
            != bits_all[b]
            for b in range(batch)
        ]
    )
    print(f"  ofdm anchor: BER={ber:.2e} ({batch}x{i.shape[1]} samples)", flush=True)
    assert ber < 1e-3, f"ofdm row invalid: BER {ber}"

    def mk(k):
        @jax.jit
        def chained(arg):
            vi, vq = arg

            def body(_, c):
                yi, yq = c
                er, ei = jax.vmap(full)(yi, yq)
                s = 0.0 * (jnp.sum(er) + jnp.sum(ei))
                return yi + s, yq

            return jax.lax.fori_loop(0, k, body, (vi, vq))

        return chained

    row(
        f"ofdm receive nfft={cfg.n_fft} ({batch}x{cfg.n_symbols} syms)",
        k_diff,
        mk,
        (i, q),
        n_samp,
    )


# --------------------------------------------------------------------------
# beamform/DOA: covariance + spectrum over a batch of snapshot blocks
# --------------------------------------------------------------------------
def beamform_rows():
    from digital_signal_processsing_tpu.models import beamform

    t_snap = 2048 if SMOKE else 16384
    for m, batch, method, n_src in (
        (16, 4 if SMOKE else 64, "mvdr", 2),
        (64, 2 if SMOKE else 16, "mvdr", 2),
        (64, 2 if SMOKE else 16, "music", 2),
    ):
        cfg = beamform.ArrayConfig(n_sensors=m)
        ai_np, aq_np = beamform.steering(cfg, beamform.scan_angles(cfg))
        ai = jnp.asarray(ai_np)
        aq = jnp.asarray(aq_np)
        rng = np.random.default_rng(m)
        xi_l, xq_l = [], []
        for b in range(batch):
            xi1, xq1 = beamform.synthesize(
                cfg, [-12.0, 23.0], t_snap, snr_db=10.0, seed=b
            )
            xi_l.append(xi1)
            xq_l.append(xq1)
        xi = jnp.asarray(np.stack(xi_l))
        xq = jnp.asarray(np.stack(xq_l))

        def spectrum(yi, yq):
            rr, ri = beamform.sample_covariance(yi, yq)
            if method == "mvdr":
                return beamform.mvdr_spectrum(
                    rr, ri, ai, aq, loading=cfg.diagonal_loading
                )
            return beamform.music_spectrum(rr, ri, ai, aq, n_sources=n_src)

        # correctness anchor: both sources within 1 deg on block 0
        spec0 = np.asarray(spectrum(xi[0], xq[0]))
        peaks = beamform._pick_peaks(beamform.scan_angles(cfg), spec0, 2)
        err = np.max(np.abs(np.sort(peaks) - np.array([-12.0, 23.0])))
        print(f"  beamform {method} M={m} anchor: max DOA err {err:.2f} deg", flush=True)
        assert err < 1.0, f"beamform row invalid: DOA err {err}"

        def mk(k):
            @jax.jit
            def chained(arg):
                vi, vq = arg

                def body(_, c):
                    yi, yq = c
                    spec = jax.vmap(spectrum)(yi, yq)
                    return yi + 0.0 * jnp.sum(spec), yq

                return jax.lax.fori_loop(0, k, body, (vi, vq))

            return chained

        row(
            f"beamform {method} M={m} ({batch}x{t_snap} snaps)",
            k_diff,
            mk,
            (xi, xq),
            xi.size,
        )


# --------------------------------------------------------------------------
# tracking: CPI stream -> detections -> tracks (detect is the batched bulk,
# the Kalman/assignment scan is the sequential tail)
# --------------------------------------------------------------------------
def tracking_row():
    from digital_signal_processsing_tpu.models import radar, tracking

    n_cpis = 4 if SMOKE else 16
    rcfg = radar.RadarConfig(
        n_pulses=64,
        n_range=2048 if SMOKE else 16384,
        pulse_len=128,
        guard=(2, 4),
        train=(4, 16),
    )
    tcfg = tracking.TrackerConfig(max_tracks=16, max_meas=4, vel_scale=64.0)
    is_l, qs_l = [], []
    for c in range(n_cpis):
        # target motion matched to doppler * vel_scale (bins/CPI) so the
        # CV tracker's gate holds one track per target across the stream
        targets = [
            (500 + round(1.28 * c), 0.02, 4.0),
            (1200 - round(1.92 * c), -0.03, 3.0),
            (900, 0.0, 3.5),
        ]
        i1, q1 = radar.synthesize(rcfg, targets, noise_power=0.05, seed=c)
        is_l.append(i1)
        qs_l.append(q1)
    i = jnp.asarray(np.stack(is_l))
    q = jnp.asarray(np.stack(qs_l))

    # correctness anchor: every true target has a confirmed track within
    # 2 bins at stream end (matched-filter sidelobe peaks may add tracks
    # of their own — physical extras, not failures)
    state, hist = tracking.track_detections(rcfg, tcfg, i, q)
    conf = np.asarray(state.active) & (np.asarray(state.hits) >= 3)
    pos = np.asarray(state.x)[conf, 0]
    truth = np.array(
        [500 + round(1.28 * (n_cpis - 1)), 1200 - round(1.92 * (n_cpis - 1)), 900.0]
    )
    errs = [np.min(np.abs(pos - t)) if pos.size else np.inf for t in truth]
    print(
        f"  tracking anchor: {conf.sum()} confirmed tracks, "
        f"per-target err {np.round(errs, 2)} bins",
        flush=True,
    )
    assert max(errs) < 2.0, f"tracking row invalid: target errs {errs}"

    def mk(k):
        @jax.jit
        def chained(arg):
            vi, vq = arg

            def body(_, c):
                yi, yq = c
                st, _ = tracking.track_detections(rcfg, tcfg, yi, yq)
                return yi + 0.0 * jnp.sum(st.x), yq

            return jax.lax.fori_loop(0, k, body, (vi, vq))

        return chained

    row(
        f"tracking {n_cpis} CPIs ({rcfg.n_pulses}x{rcfg.n_range})",
        k_diff,
        mk,
        (i, q),
        i.size,
    )


# --------------------------------------------------------------------------
# wideband scanner: one real stream -> 64 FM channels of audio
# --------------------------------------------------------------------------
def wideband_row():
    from digital_signal_processsing_tpu.models import wideband

    n_ch = 64
    t = n_ch * (8192 if SMOKE else 524288)
    recv = wideband.WidebandFmReceiver(wideband.WidebandConfig(n_channels=n_ch))
    x = jnp.asarray(recv.example_input(t))

    def mk(k):
        @jax.jit
        def chained(v):
            def body(_, y):
                audio = recv(y)
                return y + 0.0 * jnp.sum(audio)

            return jax.lax.fori_loop(0, k, body, v)

        return chained

    row(f"wideband scanner {n_ch}ch ({t} samples)", k_diff, mk, x, t)


def main() -> None:
    fams = os.environ.get(
        "FAMILIES", "modem,ofdm,beamform,tracking,wideband"
    ).split(",")
    fns = {
        "modem": modem_row,
        "ofdm": ofdm_row,
        "beamform": beamform_rows,
        "tracking": tracking_row,
        "wideband": wideband_row,
    }
    for name in fams:
        row(name, lambda _, f=fns[name]: f())
    print(f"DONE crashes={CRASHES}", flush=True)


if __name__ == "__main__":
    main()
