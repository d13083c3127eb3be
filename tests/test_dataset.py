"""Data loader: seamless multi-file chunking, prefetch, device staging."""

import numpy as np
import pytest

from digital_signal_processsing_tpu.io import write_wav
from digital_signal_processsing_tpu.io.dataset import (
    WavChunkLoader,
    device_chunks,
    prefetch,
)
from digital_signal_processsing_tpu.golden import moving_average_golden
from digital_signal_processsing_tpu.ops.streaming import (
    moving_average_chunk,
    moving_average_init,
)
from tests.conftest import make_interleaved


@pytest.fixture
def wav_files(tmp_path, rng):
    datas = []
    paths = []
    for i, frames in enumerate([1000, 1700, 300]):
        d = make_interleaved(rng, frames, 2)
        p = tmp_path / f"f{i}.wav"
        write_wav(p, d, 44100, 2)
        paths.append(p)
        datas.append(d)
    return paths, np.concatenate(datas)


def test_chunks_cover_stream_seamlessly(wav_files):
    paths, full = wav_files
    loader = WavChunkLoader(paths, chunk_samples=512)
    got = np.concatenate(list(loader))
    assert got.size % 512 == 0
    np.testing.assert_array_equal(got[: full.size], full)
    assert (got[full.size :] == 0).all()  # zero-padded tail


def test_drop_remainder(wav_files):
    paths, full = wav_files
    loader = WavChunkLoader(paths, chunk_samples=512, drop_remainder=True)
    got = np.concatenate(list(loader))
    assert got.size == (full.size // 512) * 512
    np.testing.assert_array_equal(got, full[: got.size])


def test_loader_plus_streaming_average_equals_one_shot(wav_files):
    # the full input pipeline: files -> chunks -> stateful kernel
    paths, full = wav_files
    loader = WavChunkLoader(paths, chunk_samples=512, drop_remainder=True)
    state = moving_average_init(16, 2)
    outs = []
    for chunk in prefetch(iter(loader)):
        state, y = moving_average_chunk(state, chunk, 16, 2)
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    want = moving_average_golden(full[: got.size], 16, 2)
    np.testing.assert_array_equal(got, want)


def test_device_chunks(wav_files):
    paths, full = wav_files
    loader = WavChunkLoader(paths, chunk_samples=1024, drop_remainder=True)
    chunks = list(device_chunks(loader))
    assert all(hasattr(c, "devices") for c in chunks)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(c) for c in chunks]), full[: 1024 * len(chunks)]
    )


def test_mismatched_channels_rejected(tmp_path, rng, wav_files):
    paths, _ = wav_files
    mono = tmp_path / "mono.wav"
    write_wav(mono, make_interleaved(rng, 100, 1), 44100, 1)
    loader = WavChunkLoader([paths[0], mono], chunk_samples=64)
    with pytest.raises(ValueError, match="channels"):
        list(loader)


def test_prefetch_propagates_errors():
    def bad():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(bad())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_packed_loader_yields_pair_views(tmp_path, rng):
    # packed=True chunks are the int32 pair view of the identical samples
    from digital_signal_processsing_tpu.io.dataset import WavChunkLoader
    from digital_signal_processsing_tpu.io.wav import write_wav

    x = rng.integers(-32768, 32768, size=2048, dtype=np.int16)
    write_wav(tmp_path / "a.wav", x, 44100, 2)
    plain = np.concatenate(list(WavChunkLoader([tmp_path / "a.wav"], 512)))
    packed = list(WavChunkLoader([tmp_path / "a.wav"], 512, packed=True))
    assert all(c.dtype == np.int32 and c.shape == (256,) for c in packed)
    np.testing.assert_array_equal(
        np.concatenate(packed).view(np.int16), plain
    )
    with pytest.raises(ValueError, match="256"):
        WavChunkLoader([tmp_path / "a.wav"], 100, packed=True)
