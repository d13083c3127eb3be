"""WAV codec roundtrip + rejection tests (wav_header.h parity)."""

import struct

import numpy as np
import pytest

from digital_signal_processsing_tpu.io import read_wav, read_wav_widened, write_wav
from tests.conftest import make_interleaved


def test_roundtrip(tmp_path, rng):
    x = make_interleaved(rng, 1000, 2)
    p = tmp_path / "t.wav"
    write_wav(p, x, sample_rate=44100, num_channels=2)
    info, got = read_wav(p)
    assert info.num_channels == 2
    assert info.sample_rate == 44100
    assert info.bits_per_sample == 16
    assert info.num_samples == 2000
    assert info.num_frames == 1000
    np.testing.assert_array_equal(got, x)


def test_widened_roundtrip(tmp_path, rng):
    x = make_interleaved(rng, 64, 1)
    p = tmp_path / "t.wav"
    write_wav(p, x, sample_rate=8000, num_channels=1)
    info, got = read_wav_widened(p)
    assert got.dtype == np.int64
    np.testing.assert_array_equal(got, x.astype(np.int64))


@pytest.mark.parametrize("bits", [8, 24, 32, 64])
def test_rejects_unsupported_bit_depths(tmp_path, bits):
    # Mirror wav_header.h:34-37 rejection list.
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36, b"WAVE", b"fmt ", 16, 1, 1, 44100,
        44100 * bits // 8, bits // 8, bits, b"data", 0,
    )
    p = tmp_path / "bad.wav"
    p.write_bytes(header)
    with pytest.raises(ValueError, match="unsupported bits per sample"):
        read_wav(p)


def test_rejects_garbage(tmp_path):
    p = tmp_path / "junk.wav"
    p.write_bytes(b"not a wav file at all, definitely not 44 bytes of riff")
    with pytest.raises(ValueError):
        read_wav(p)


def test_rejects_non_pcm(tmp_path):
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36, b"WAVE", b"fmt ", 16, 3, 1, 44100, 176400, 4, 16,
        b"data", 0,
    )
    p = tmp_path / "f.wav"
    p.write_bytes(header)
    with pytest.raises(ValueError, match="PCM"):
        read_wav(p)


def test_truncated_data_clamped(tmp_path, rng):
    x = make_interleaved(rng, 16, 1)
    p = tmp_path / "t.wav"
    write_wav(p, x, sample_rate=44100, num_channels=1)
    raw = p.read_bytes()
    p.write_bytes(raw[:-8])  # chop 4 samples
    info, got = read_wav(p)
    assert info.num_samples == 12
    np.testing.assert_array_equal(got, x[:12])
