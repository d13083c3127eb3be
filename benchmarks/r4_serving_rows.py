"""Round-4: on-chip smoke rows for the round-3 serving loops.

VERDICT r3 item 8: stream_sosfilt / stream_time_stretch / stream_mfcc are
CPU-tested but have no on-chip rows (the serving table only covers the
averager path). One row each: chunked == one-shot parity ON CHIP plus
wall-clock MS/s. These are END-TO-END rows (WAV decode -> chunk op ->
sink), so on this runner they include the axon tunnel's host<->device
cost — the r2 serving-table caveat applies; the parity bit is the real
content. Oracle spellings mirror the CPU parity tests
(tests/test_serve.py, test_mel.py, test_phase_vocoder.py). Crash-isolated
per row.
"""

from __future__ import annotations

import sys
import tempfile
import time
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

CRASHES = 0
TOTAL = 8_000_000  # interleaved int16 samples per stream (2 files)
CHANNELS = 2


def row(name, fn):
    global CRASHES
    try:
        fn()
    except Exception:
        CRASHES += 1
        print(f"CRASH {name}:", flush=True)
        traceback.print_exc()


def main() -> None:
    assert jax.default_backend() == "tpu"
    from digital_signal_processsing_tpu import serve
    from digital_signal_processsing_tpu.io.wav import read_wav, write_wav
    from digital_signal_processsing_tpu.ops import iir as _iir
    from digital_signal_processsing_tpu.ops import mel as _mel
    from digital_signal_processsing_tpu.ops import phase_vocoder as _pv

    rng = np.random.default_rng(7)
    tmp = tempfile.mkdtemp()
    paths = []
    parts = []
    for i in range(2):
        p = Path(tmp) / f"in{i}.wav"
        data = rng.integers(-20000, 20000, size=TOTAL // 2, dtype=np.int16)
        write_wav(p, data, 44100, CHANNELS)
        paths.append(p)
        parts.append(data)
    full = np.concatenate(parts)
    planar = full.reshape(-1, CHANNELS).T.astype(np.float32)

    def sosfilt_row():
        sos = _iir.design_butterworth(8, 0.2)
        out = Path(tmp) / "sos.wav"
        t0 = time.perf_counter()
        n = serve.stream_sosfilt(paths, out, sos)
        dt = time.perf_counter() - t0
        _, got = read_wav(out)
        ref = np.asarray(_iir.sosfilt(sos, jnp.asarray(planar)))
        ref_i = np.clip(
            np.rint(ref.T.reshape(-1)), -32768, 32767
        ).astype(np.int16)
        diff = np.abs(got.astype(np.int32) - ref_i[: got.size].astype(np.int32))
        print(
            f"stream_sosfilt: {n} samples in {dt:.2f}s = {n/dt/1e6:.2f} MS/s "
            f"wall; chunked-vs-oneshot max int16 diff = {int(diff.max())}, "
            f"frac>0 = {float((diff > 0).mean()):.2e}",
            flush=True,
        )
        assert diff.max() <= 1, diff.max()

    def stretch_row():
        out = Path(tmp) / "ts.wav"
        rate, nfft = 1.25, 2048
        ha = max(1, int(round(nfft // 4 * rate)))
        t0 = time.perf_counter()
        n = serve.stream_time_stretch(paths, out, rate, nfft=nfft)
        dt = time.perf_counter() - t0
        _, got = read_wav(out)
        got_f = got.reshape(-1, CHANNELS).T.astype(np.float32) / 32768.0
        # one-shot oracle (test_phase_vocoder.py chunk-parity spelling):
        # zero-prime the head by nfft-ha, pad the tail to the ha grid
        xn = planar / 32768.0
        pad = (-xn.shape[-1]) % ha
        xpad = np.concatenate(
            [
                np.zeros((CHANNELS, nfft - ha), np.float32),
                xn,
                np.zeros((CHANNELS, pad), np.float32),
            ],
            axis=-1,
        )
        want = np.asarray(_pv.time_stretch(jnp.asarray(xpad), rate, nfft=nfft))
        m = min(got_f.shape[-1], want.shape[-1])
        diff = float(np.abs(got_f[:, :m] - want[:, :m]).max())
        print(
            f"stream_time_stretch: {n} frames out in {dt:.2f}s = "
            f"{TOTAL/dt/1e6:.2f} MS/s (input) wall; chunked-vs-oneshot max "
            f"abs diff over {m} samples = {diff:.3e} (vocoder tol 2e-2 + "
            "int16 quantization)",
            flush=True,
        )
        assert diff < 2.1e-2, diff

    def mfcc_row():
        nfft, hop, n_mels = 512, 256, 40
        t0 = time.perf_counter()
        feats = serve.stream_mfcc(paths, nfft=nfft, hop=hop, n_mels=n_mels)
        dt = time.perf_counter() - t0
        # one-shot oracle (test_mel.py spelling): zero-prime by nfft-hop,
        # pad the tail to the hop grid
        xn = planar / 32768.0
        pad = (-xn.shape[-1]) % hop
        primed = np.concatenate(
            [
                np.zeros((CHANNELS, nfft - hop), np.float32),
                xn,
                np.zeros((CHANNELS, pad), np.float32),
            ],
            axis=-1,
        )
        want = np.asarray(
            _mel.mfcc(
                jnp.asarray(primed), sample_rate=44100.0, n_mfcc=13,
                nfft=nfft, hop=hop, n_mels=n_mels, window="hann",
            )
        )
        m = min(feats.shape[1], want.shape[1])
        diff = float(np.abs(feats[:, :m] - want[:, :m]).max())
        print(
            f"stream_mfcc: {feats.shape} feats in {dt:.2f}s = "
            f"{TOTAL/dt/1e6:.2f} MS/s (input) wall; chunked-vs-oneshot max "
            f"abs diff = {diff:.2e}",
            flush=True,
        )
        assert diff < 1e-3, diff

    row("stream_sosfilt", sosfilt_row)
    row("stream_time_stretch", stretch_row)
    row("stream_mfcc", mfcc_row)
    print(f"DONE crashes={CRASHES}", flush=True)


if __name__ == "__main__":
    main()
