"""Native C++ runtime: codec parity with the Python codec, averager parity
with the golden model, CLI contract."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from digital_signal_processsing_tpu.golden import moving_average_golden
from digital_signal_processsing_tpu.io import read_wav, write_wav
from digital_signal_processsing_tpu.io import native
from tests.conftest import make_interleaved

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_wav_roundtrip(tmp_path, rng):
    x = make_interleaved(rng, 5000, 2)
    p = tmp_path / "n.wav"
    native.write_wav_native(p, x, 44100, 2)
    ch, rate, got = native.read_wav_native(p)
    assert (ch, rate) == (2, 44100)
    np.testing.assert_array_equal(got, x)


def test_native_vs_python_codec(tmp_path, rng):
    x = make_interleaved(rng, 3000, 2)
    p1, p2 = tmp_path / "py.wav", tmp_path / "na.wav"
    write_wav(p1, x, 22050, 2)
    native.write_wav_native(p2, x, 22050, 2)
    assert p1.read_bytes() == p2.read_bytes()  # byte-identical files
    _, _, got = native.read_wav_native(p1)
    np.testing.assert_array_equal(got, x)
    info, got2 = read_wav(p2)
    np.testing.assert_array_equal(got2, x)


@pytest.mark.parametrize("window,channels", [(1, 1), (16, 2), (1000, 2)])
def test_native_averager_parity(rng, window, channels):
    x = make_interleaved(rng, 5000, channels)
    got = native.moving_average_native(x, window, channels)
    np.testing.assert_array_equal(got, moving_average_golden(x, window, channels))


def test_native_averager_negative_truncation():
    x = np.array([-3, 0, 0], dtype=np.int16)
    got = native.moving_average_native(x, 2, 1)
    np.testing.assert_array_equal(got, [-1, -1, 0])


def test_native_bench_returns_time(rng):
    x = make_interleaved(rng, 100_000, 2)
    ms = native.bench_moving_average_native(x, 16, 2, warmup=1, rounds=2)
    assert ms > 0


def test_cli_binary(tmp_path, rng):
    bench = Path(native._NATIVE_DIR) / "dsp_cpu_bench"
    if not bench.exists():
        subprocess.run(["make", "-C", str(native._NATIVE_DIR)], check=True)
    x = make_interleaved(rng, 10_000, 2)
    wav = tmp_path / "c.wav"
    write_wav(wav, x, 44100, 2)
    r = subprocess.run(
        [str(bench), str(wav), "16", "256"], capture_output=True, text=True
    )
    assert r.returncode == 0, r.stderr
    assert "MSamples/s" in r.stdout
    # argv contract: bad block size rejected (reference binaries' check)
    r2 = subprocess.run(
        [str(bench), str(wav), "16", "33"], capture_output=True, text=True
    )
    assert r2.returncode == 1


def test_threaded_batch_reader(tmp_path, rng):
    datas, paths = [], []
    for i, frames in enumerate([500, 1200, 50, 900]):
        d = make_interleaved(rng, frames, 2)
        p = tmp_path / f"b{i}.wav"
        native.write_wav_native(p, d, 44100, 2)
        datas.append(d)
        paths.append(p)
    ch, rate, got = native.read_wavs_concat_native(paths, num_threads=3)
    assert (ch, rate) == (2, 44100)
    np.testing.assert_array_equal(got, np.concatenate(datas))


def test_threaded_batch_reader_mismatch(tmp_path, rng):
    p1 = tmp_path / "a.wav"
    p2 = tmp_path / "b.wav"
    native.write_wav_native(p1, make_interleaved(rng, 100, 2), 44100, 2)
    native.write_wav_native(p2, make_interleaved(rng, 100, 1), 44100, 1)
    with pytest.raises(ValueError):
        native.read_wavs_concat_native([p1, p2])


def test_native_chunk_stream_matches_loader(tmp_path, rng):
    # the C++ decode ring yields the identical chunk sequence as the
    # Python WavChunkLoader, across file boundaries and the padded tail
    native = pytest.importorskip(
        "digital_signal_processsing_tpu.io.native", reason="native build"
    )
    if not native.available():
        pytest.skip("native library not built")
    from digital_signal_processsing_tpu.io.dataset import WavChunkLoader
    from digital_signal_processsing_tpu.io.wav import write_wav

    sizes = [3000, 1700, 4096]
    paths = []
    for i, n in enumerate(sizes):
        x = rng.integers(-32768, 32768, size=n, dtype=np.int16)
        p = tmp_path / f"s{i}.wav"
        write_wav(p, x, 8000, 1)
        paths.append(p)
    want = list(WavChunkLoader(paths, 1024))
    stream = native.NativeChunkStream(paths, 1024)
    got = list(stream)
    assert len(got) == len(want)
    total = sum(sizes)
    seen = 0
    for (chunk, valid), w in zip(got, want):
        np.testing.assert_array_equal(chunk, w)
        assert valid == min(1024, total - seen)
        seen += valid


def test_native_wav_sink_matches_wavwriter(tmp_path, rng):
    native = pytest.importorskip(
        "digital_signal_processsing_tpu.io.native", reason="native build"
    )
    if not native.available():
        pytest.skip("native library not built")
    from digital_signal_processsing_tpu.io.wav import WavWriter, read_wav

    x = rng.integers(-32768, 32768, size=9000, dtype=np.int16)
    with WavWriter(tmp_path / "py.wav", 44100, 2) as w:
        for i in range(0, 9000, 1500):
            w.append(x[i : i + 1500])
    with native.NativeWavSink(tmp_path / "na.wav", 44100, 2) as s:
        for i in range(0, 9000, 1500):
            s.append(x[i : i + 1500])
    assert (tmp_path / "py.wav").read_bytes() == (tmp_path / "na.wav").read_bytes()
    info, back = read_wav(tmp_path / "na.wav")
    np.testing.assert_array_equal(back, x)


def test_serve_native_host_bit_identical(tmp_path, rng):
    native = pytest.importorskip(
        "digital_signal_processsing_tpu.io.native", reason="native build"
    )
    if not native.available():
        pytest.skip("native library not built")
    from digital_signal_processsing_tpu.io.wav import write_wav
    from digital_signal_processsing_tpu.serve import stream_moving_average

    paths = []
    for i, n in enumerate([40000, 25002]):
        x = rng.integers(-32768, 32768, size=n, dtype=np.int16)
        p = tmp_path / f"in{i}.wav"
        write_wav(p, x, 48000, 2)
        paths.append(p)
    n_py = stream_moving_average(
        paths, tmp_path / "py.wav", 64, chunk_samples=8192, use_native=False
    )
    n_na = stream_moving_average(
        paths, tmp_path / "na.wav", 64, chunk_samples=8192, use_native=True
    )
    assert n_py == n_na == 65002
    assert (tmp_path / "py.wav").read_bytes() == (tmp_path / "na.wav").read_bytes()
