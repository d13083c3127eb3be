"""Serving loop: multi-WAV stream -> chunked TPU compute -> streaming sink."""

import numpy as np

from digital_signal_processsing_tpu.golden import moving_average_golden
from digital_signal_processsing_tpu.io.wav import WavWriter, read_wav, write_wav
from digital_signal_processsing_tpu.serve import run_chunks, stream_moving_average


def test_wav_writer_streaming_equals_one_shot(rng, tmp_path):
    x = rng.integers(-32768, 32768, size=10000, dtype=np.int16)
    write_wav(tmp_path / "oneshot.wav", x, 8000, 2)
    with WavWriter(tmp_path / "streamed.wav", 8000, 2) as w:
        for a, b in [(0, 3000), (3000, 9000), (9000, 10000)]:
            w.append(x[a:b])
    assert (tmp_path / "oneshot.wav").read_bytes() == (
        tmp_path / "streamed.wav"
    ).read_bytes()


def test_stream_moving_average_end_to_end(rng, tmp_path):
    # two files, odd total length: the streamed pipeline must be bit-exact
    # with the one-shot golden on the concatenated stream, pad dropped
    c, w = 2, 257
    xs = [
        rng.integers(-32768, 32768, size=n, dtype=np.int16)
        for n in (30000, 17034)
    ]
    for i, x in enumerate(xs):
        write_wav(tmp_path / f"in{i}.wav", x, 44100, c)
    full = np.concatenate(xs)

    written = stream_moving_average(
        [tmp_path / "in0.wav", tmp_path / "in1.wav"],
        tmp_path / "out.wav",
        w,
        chunk_samples=8192,
    )
    assert written == full.size
    info, got = read_wav(tmp_path / "out.wav")
    assert info.num_channels == c
    np.testing.assert_array_equal(got, moving_average_golden(full, w, c))


def test_run_chunks_generic(rng):
    from digital_signal_processsing_tpu.ops.iir import (
        design_butterworth,
        sosfilt,
        sosfilt_chunk,
        sosfilt_init,
    )

    sos = np.asarray(design_butterworth(4, 0.2))
    x = rng.normal(size=4096).astype(np.float32)
    want = np.asarray(sosfilt(sos, x))
    outs = list(
        run_chunks(
            lambda st, ch: sosfilt_chunk(st, sos, ch),
            sosfilt_init(sos),
            [x[:1000], x[1000:3000], x[3000:]],
        )
    )
    np.testing.assert_allclose(np.concatenate(outs), want, rtol=1e-4, atol=1e-5)
