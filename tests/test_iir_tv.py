"""Time-varying SOS (sosfilt_tv family) parity and streaming tests.

Golden model: a per-sample numpy loop of the standard time-varying DF2T
recurrence (coefficients applied at each output sample). The reference
CUDA study has no time-varying analog; this surface exists for LPC
synthesis / adaptive-notch automation (ROADMAP round-3 item 4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from digital_signal_processsing_tpu.ops import iir


def tv_ref(sos_t, x):
    """(S, n, 6) per-sample rows, float64 loop."""
    S, n, _ = sos_t.shape
    y = x.astype(np.float64).copy()
    for s in range(S):
        st1 = st2 = 0.0
        out = np.zeros(n)
        for t in range(n):
            b0, b1, b2, a0, a1, a2 = sos_t[s, t]
            b0, b1, b2, a1, a2 = b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0
            yo = b0 * y[t] + st1
            st1 = b1 * y[t] - a1 * yo + st2
            st2 = b2 * y[t] - a2 * yo
            out[t] = yo
        y = out
    return y


def make_schedule(n, seed):
    """Smoothly swept stable biquad rows, a0 != 1 to exercise per-sample
    normalization."""
    r = 0.5 + 0.4 * np.sin(np.linspace(0, 3, n) + seed)
    th = 0.3 + 0.2 * np.cos(np.linspace(0, 2, n) + seed)
    a1 = -2 * r * np.cos(th)
    a2 = r**2
    b0 = np.full(n, 0.3)
    b1 = 0.1 * np.sin(np.linspace(0, 5, n))
    b2 = np.full(n, 0.05)
    a0 = np.full(n, 1.0 + 0.1 * seed)
    return np.stack([b0, b1, b2, a0, a1, a2], -1)


@pytest.fixture(scope="module")
def swept():
    rng = np.random.default_rng(7)
    n = 1000
    x = rng.standard_normal(n).astype(np.float32)
    sos_t = np.stack([make_schedule(n, 0), make_schedule(n, 1)], 0).astype(
        np.float32
    )
    return x, sos_t


def test_matches_golden_loop(swept):
    x, sos_t = swept
    ref = tv_ref(sos_t.astype(np.float64), x)
    got = np.asarray(iir.sosfilt_tv(sos_t, x, tile_rows=2))
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 1e-5, err


def test_constant_schedule_matches_sosfilt(swept):
    x, _ = swept
    sos = np.array(
        [
            [0.2, 0.1, 0.05, 1.0, -0.6, 0.2],
            [0.3, 0.0, 0.1, 1.0, -0.2, 0.5],
        ],
        np.float32,
    )
    sos_t = np.broadcast_to(sos[:, None, :], (2, x.size, 6)).copy()
    y_tv = np.asarray(iir.sosfilt_tv(sos_t, x, tile_rows=2))
    y_c = np.asarray(iir.sosfilt_pallas(sos, x, tile_rows=2))
    assert np.max(np.abs(y_tv - y_c)) < 1e-5


def test_per_channel_schedules(swept):
    x, _ = swept
    rng = np.random.default_rng(3)
    xb = rng.standard_normal((3, x.size)).astype(np.float32)
    sos_b = np.stack(
        [np.stack([make_schedule(x.size, i + 3) for i in range(3)], 0)], 0
    ).astype(np.float32)
    got = np.asarray(iir.sosfilt_tv(sos_b, xb, tile_rows=2))
    for c in range(3):
        ref = tv_ref(sos_b[:, c].astype(np.float64), xb[c])
        err = np.max(np.abs(got[c] - ref)) / np.max(np.abs(ref))
        assert err < 1e-5, (c, err)


def test_chunked_streaming_bit_consistency(swept):
    x, sos_t = swept
    one_shot = np.asarray(iir.sosfilt_tv(sos_t, x, tile_rows=2))
    st = jnp.zeros((2, 2))
    parts = []
    for lo in range(0, x.size, 300):
        hi = min(x.size, lo + 300)
        st, yp = iir.sosfilt_tv_chunk(
            st,
            jnp.asarray(sos_t[:, lo:hi]),
            jnp.asarray(x[lo:hi]),
            tile_rows=2,
        )
        parts.append(np.asarray(yp))
    assert np.max(np.abs(np.concatenate(parts) - one_shot)) < 1e-5


def test_frames_expansion(swept):
    x, sos_t = swept
    fl = 100
    sos_fr = sos_t[:, ::fl, :]
    got = np.asarray(iir.sosfilt_tv_frames(sos_fr, x, fl, tile_rows=2))
    ref = tv_ref(np.repeat(sos_fr, fl, axis=1).astype(np.float64), x)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 1e-5, err


def test_frames_too_short_raises(swept):
    x, sos_t = swept
    with pytest.raises(ValueError):
        iir.sosfilt_tv_frames(sos_t[:, :3, :], x, 10)


def test_shape_mismatch_raises(swept):
    x, sos_t = swept
    with pytest.raises(ValueError):
        iir.sosfilt_tv(sos_t[:, :-1, :], x)


def test_fused_cascade_matches_scan_spelling(swept):
    x, sos_t = swept
    scan = np.asarray(iir.sosfilt_tv(sos_t, x, tile_rows=2, method="scan"))
    fused = np.asarray(iir.sosfilt_tv_fused(sos_t, x, tile_rows=2))
    auto = np.asarray(iir.sosfilt_tv(sos_t, x, tile_rows=2))  # auto -> fused
    assert np.array_equal(fused, auto)
    assert np.max(np.abs(fused - scan)) < 1e-6
    with pytest.raises(ValueError):
        iir.sosfilt_tv(sos_t, x, method="warp")


@pytest.mark.parametrize("tile_rows", [128, 256])
def test_fused_compact_row_pass(tile_rows):
    # round-3: TV row-level composition on a (rows/128, 128) relayout
    rng = np.random.default_rng(11)
    n = tile_rows * 128 * 2 + 99
    x = rng.standard_normal(n).astype(np.float32)
    sos_t = np.stack(
        [make_schedule(n, 0), make_schedule(n, 1)], 0
    ).astype(np.float32)
    # 'want' must be an INDEPENDENT spelling: since round 3 the fused
    # default at these tile_rows IS compact, so pin bcast explicitly
    # (otherwise this parity check compares compact against itself)
    want = np.asarray(
        iir.sosfilt_tv_fused(sos_t, x, tile_rows=tile_rows, row_pass="bcast")
    )
    got = np.asarray(
        iir.sosfilt_tv_fused(
            sos_t, x, tile_rows=tile_rows, row_pass="compact"
        )
    )
    scale = np.max(np.abs(want)) + 1e-9
    assert np.max(np.abs(got - want)) / scale < 1e-6
    with pytest.raises(ValueError):
        iir.sosfilt_tv_fused(sos_t, x, tile_rows=8, row_pass="compact")
    with pytest.raises(ValueError):
        iir.sosfilt_tv_fused(sos_t, x, tile_rows=32768, row_pass="compact")
    # out-of-range default falls back to bcast instead of asserting
    big = np.asarray(iir.sosfilt_tv_fused(sos_t, x, tile_rows=64))
    assert big.shape == x.shape
