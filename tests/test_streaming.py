"""Streaming ops: chunked processing == one-shot processing, bit-exact."""

import numpy as np
import pytest

from digital_signal_processsing_tpu.golden import moving_average_golden
from digital_signal_processsing_tpu.ops.fir import design_lowpass, fir_direct
from digital_signal_processsing_tpu.ops.streaming import (
    fir_chunk,
    fir_init,
    moving_average_chunk,
    moving_average_init,
)
from tests.conftest import make_interleaved


@pytest.mark.parametrize("window,channels", [(16, 2), (300, 2), (7, 1)])
def test_streaming_average_matches_one_shot(rng, window, channels):
    x = make_interleaved(rng, 5000, channels)
    want = moving_average_golden(x, window, channels)
    state = moving_average_init(window, channels)
    outs = []
    # uneven chunk sizes, including one smaller than the halo
    bounds = [0, 100 * channels, 700 * channels, 1500 * channels, x.size]
    for a, b in zip(bounds[:-1], bounds[1:]):
        state, y = moving_average_chunk(state, x[a:b], window, channels)
        outs.append(np.asarray(y))
    np.testing.assert_array_equal(np.concatenate(outs), want)


def test_streaming_average_scan_compatible(rng):
    # state threads through jax.lax.scan over equal chunks
    import jax
    import jax.numpy as jnp

    window, channels = 32, 2
    x = make_interleaved(rng, 4096, channels)
    chunks = jnp.asarray(x.reshape(8, -1))

    def step(state, chunk):
        state, y = moving_average_chunk(state, chunk, window, channels)
        return state, y

    _, ys = jax.lax.scan(step, moving_average_init(window, channels), chunks)
    got = np.asarray(ys).reshape(-1)
    np.testing.assert_array_equal(got, moving_average_golden(x, window, channels))


@pytest.mark.parametrize("k", [1, 33, 129])
def test_streaming_fir_matches_one_shot(rng, k):
    x = rng.normal(size=(3, 4000)).astype(np.float32)
    taps = design_lowpass(k, 0.3) if k > 1 else np.ones(1, np.float32)
    want = np.asarray(fir_direct(x, taps))
    state = fir_init(k, 3)
    outs = []
    for a, b in [(0, 500), (500, 2100), (2100, 4000)]:
        state, y = fir_chunk(state, x[:, a:b], taps)
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_streaming_mixed_lane_aligned_and_odd_chunks(rng):
    # lane-aligned chunks take the seeded windowed kernel; odd lengths fall
    # back to the XLA recurrence — the two must interleave bit-exactly
    window, channels = 100, 2
    chunks = [1280, 1000, 2560, 56, 128]
    x = make_interleaved(rng, sum(chunks) // channels, channels)
    state = moving_average_init(window, channels)
    outs, i = [], 0
    for ln in chunks:
        state, y = moving_average_chunk(state, x[i : i + ln], window, channels)
        outs.append(np.asarray(y))
        i += ln
    got = np.concatenate(outs)
    np.testing.assert_array_equal(got, moving_average_golden(x, window, channels))


def test_streaming_giant_halo_falls_back_to_xla(rng):
    # halo beyond the windowed kernel's envelope uses the sliding recurrence
    c, w = 128, 8192
    x = make_interleaved(rng, 2**21 // c, c)
    state = moving_average_init(w, c)
    state, y1 = moving_average_chunk(state, x[: 2**20], w, c)
    state, y2 = moving_average_chunk(state, x[2**20 :], w, c)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    np.testing.assert_array_equal(got, moving_average_golden(x, w, c))


def test_streaming_state_checkpoint_resume(rng, tmp_path):
    # kill-and-resume mid-stream: the restored state continues bit-exactly
    from digital_signal_processsing_tpu.utils.checkpoint import (
        load_pytree,
        save_pytree,
    )

    w, c = 100, 2
    x = make_interleaved(rng, 4096, c)
    want = moving_average_golden(x, w, c)

    state = moving_average_init(w, c)
    state, y1 = moving_average_chunk(state, x[:3000], w, c)
    save_pytree(tmp_path / "stream.npz", state)

    restored = load_pytree(tmp_path / "stream.npz", moving_average_init(w, c))
    _, y2 = moving_average_chunk(restored, x[3000:], w, c)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    np.testing.assert_array_equal(got, want)


def test_checkpoint_dtype_mismatch_raises(tmp_path):
    # a lossy silent cast (float64 -> float32, int32 -> int16) would break
    # the bit-exact-resume guarantee; load must refuse instead
    import pytest

    from digital_signal_processsing_tpu.utils.checkpoint import (
        load_pytree,
        save_pytree,
    )

    save_pytree(tmp_path / "s.npz", {"a": np.ones(4, np.float64)})
    with pytest.raises(ValueError, match="dtype"):
        load_pytree(tmp_path / "s.npz", {"a": np.ones(4, np.float32)})
