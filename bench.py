"""Headline benchmark: scan-averager samples/s per chip at window k=1024.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Method: the carry-free fused windowed averager (MXU lane passes) over a
64M-sample stereo int16 stream, window 1024 — BASELINE.json's per-chip
headline config. (The int32 pair-packed transport variant measures within
session noise of this path — see BENCH_NOTES.md — so the headline uses the
plain int16 entry.)
Kernel time is isolated with a K-differential: time jit-chained applications
at two chain lengths and take the slope, which cancels dispatch/transfer
overhead (large and noisy through the axon tunnel; see BENCH_NOTES.md).

vs_baseline: the reference's Jetson Nano scan kernel measures ~19 ms
(logs/benchmark_comparison.png, Hillis-Steele kernel bar) on the sweep's
mid-size ~10M-sample input => ~0.53 GSamples/s kernel-only. We use 0.5 GS/s
as the baseline denominator (BASELINE.md target: >=10x at k=1024).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

JETSON_SCAN_K1024_SPS = 0.5e9  # see module docstring
N = 64_000_000
WINDOW = 1024
CHANNELS = 2
K_SMALL, K_BIG = 8, 40  # wide K spread: jitter amortizes over 32 iterations
REPEATS = 5  # min-of-5: the axon tunnel adds multi-ms session jitter


WATCHDOG_S = 1800  # a wedged axon tunnel blocks forever; fail loud instead


def _watchdog():
    sys.stderr.write(
        f"bench.py: no result after {WATCHDOG_S}s — device tunnel is likely "
        "wedged (see BENCH_NOTES.md Methodology); aborting without a JSON "
        "line rather than hanging the driver\n"
    )
    sys.stderr.flush()
    os._exit(3)


def main() -> None:
    timer = threading.Timer(WATCHDOG_S, _watchdog)
    timer.daemon = True
    timer.start()

    import jax

    from digital_signal_processsing_tpu.ops.pallas_scan import (
        windowed_averager_pallas,
    )

    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, size=N, dtype=np.int16)
    xd = jax.device_put(x)

    def make_chained(k):
        @jax.jit
        def chained(v):
            def body(i, y):
                return windowed_averager_pallas(y, WINDOW, CHANNELS)

            return jax.lax.fori_loop(0, k, body, v)

        return chained

    def timed(fn):
        np.asarray(fn(xd)[:8])  # compile + warm, with a real fetch
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            np.asarray(fn(xd)[:8])  # tiny fetch forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    t_small = timed(make_chained(K_SMALL))
    t_big = timed(make_chained(K_BIG))
    per_iter = (t_big - t_small) / (K_BIG - K_SMALL)
    if per_iter <= 0:  # degenerate timing (e.g. interpret mode); fall back
        per_iter = t_big / K_BIG
    sps = N / per_iter
    timer.cancel()
    print(
        json.dumps(
            {
                "metric": "scan_averager_samples_per_s_per_chip_k1024",
                "value": round(sps, 1),
                "unit": "samples/s",
                "vs_baseline": round(sps / JETSON_SCAN_K1024_SPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
