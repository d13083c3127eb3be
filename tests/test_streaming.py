"""Streaming ops: chunked processing == one-shot processing, bit-exact."""

import jax.numpy as jnp
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


class TestStreamingStft:
    def test_chunked_analysis_matches_primed_one_shot(self, rng):
        from digital_signal_processsing_tpu.ops.fft import stft
        from digital_signal_processsing_tpu.ops.streaming import (
            stft_chunk,
            stft_init,
        )

        nfft, hop = 256, 128
        x = rng.normal(size=(2, 4096)).astype(np.float32)
        st = stft_init(nfft, hop, 2)
        frames = []
        for a, b in [(0, 512), (512, 1536), (1536, 4096)]:
            st, f = stft_chunk(st, jnp.asarray(x[:, a:b]), nfft=nfft, hop=hop)
            frames.append(np.asarray(f))
        got = np.concatenate(frames, axis=1)
        primed = np.concatenate([np.zeros((2, nfft - hop), np.float32), x], -1)
        want = np.asarray(
            stft(jnp.asarray(primed), nfft=nfft, hop=hop, window="sqrt_hann")
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)
        # dropping the first nfft//hop - 1 frames recovers unprimed parity
        unprimed = np.asarray(
            stft(jnp.asarray(x), nfft=nfft, hop=hop, window="sqrt_hann")
        )
        r = nfft // hop
        np.testing.assert_allclose(
            got[:, r - 1 : r - 1 + unprimed.shape[1]], unprimed, atol=1e-5
        )

    def test_chunked_synthesis_matches_one_shot(self, rng):
        from digital_signal_processsing_tpu.ops.fft import istft, stft
        from digital_signal_processsing_tpu.ops.streaming import (
            istft_chunk,
            istft_flush,
            istft_init,
        )

        nfft, hop = 256, 128
        x = rng.normal(size=4096).astype(np.float32)
        s = np.asarray(stft(jnp.asarray(x), nfft=nfft, hop=hop, window="sqrt_hann"))
        ist = istft_init(nfft, hop, 1)
        outs = []
        for a, b in [(0, 5), (5, 17), (17, s.shape[0])]:
            ist, y = istft_chunk(
                ist, jnp.asarray(s[None, a:b]), nfft=nfft, hop=hop
            )
            outs.append(np.asarray(y)[0])
        outs.append(np.asarray(istft_flush(ist))[0])
        got = np.concatenate(outs)
        want = np.asarray(istft(jnp.asarray(s), nfft=nfft, hop=hop))
        np.testing.assert_allclose(got[: want.shape[-1]], want, atol=1e-5)

    @pytest.mark.parametrize("ratio", [2, 4])
    def test_round_trip_reconstructs_with_latency(self, rng, ratio):
        # analysis -> synthesis streams reconstruct the input delayed by
        # nfft - hop (the WOLA pipeline latency); sqrt_hann at hop=nfft/2
        # is the PR pair, hop=nfft/4 overlap-adds to a constant (2x) too
        from digital_signal_processsing_tpu.ops.streaming import (
            istft_chunk,
            istft_init,
            stft_chunk,
            stft_init,
        )

        nfft = 256
        hop = nfft // ratio
        x = rng.normal(size=(1, 8 * nfft)).astype(np.float32)
        st = stft_init(nfft, hop, 1)
        ist = istft_init(nfft, hop, 1)
        rec = []
        for a in range(0, x.shape[-1], 2 * nfft):
            st, f = stft_chunk(
                st, jnp.asarray(x[:, a : a + 2 * nfft]), nfft=nfft, hop=hop
            )
            ist, y = istft_chunk(ist, f, nfft=nfft, hop=hop)
            rec.append(np.asarray(y))
        rec = np.concatenate(rec, axis=-1)
        lat = nfft - hop
        scale = ratio / 2.0  # sqrt_hann^2 overlap-adds to ratio/2
        interior = slice(lat + nfft, rec.shape[-1] - nfft)
        np.testing.assert_allclose(
            rec[:, interior] / scale,
            x[:, : rec.shape[-1] - lat][:, slice(nfft, rec.shape[-1] - lat - nfft)],
            atol=1e-4,
        )

    def test_granularity_and_init_rejections(self):
        from digital_signal_processsing_tpu.ops.streaming import (
            stft_chunk,
            stft_init,
            istft_init,
        )

        with pytest.raises(ValueError):
            stft_init(256, 100)
        with pytest.raises(ValueError):
            istft_init(256, 0)
        st = stft_init(256, 128, 1)
        with pytest.raises(ValueError):
            stft_chunk(st, jnp.ones((1, 300)), nfft=256, hop=128)
