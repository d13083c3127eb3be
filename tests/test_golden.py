"""Golden-model self-consistency: vectorized oracle == literal sliding loop.

The reference has no tests (SURVEY.md §4); its semantic ground truth is the
serial CPU averager. These tests pin our NumPy oracle to a literal
re-derivation of that algorithm (ramp-up + sliding steady state, int64 sums,
truncating division) before every kernel is tested against the oracle.
"""

import numpy as np
import pytest

from digital_signal_processsing_tpu.golden import (
    cumsum_per_channel_golden,
    moving_average_golden,
    moving_average_golden_loop,
)
from digital_signal_processsing_tpu.utils.numerics import trunc_div
from tests.conftest import make_interleaved


@pytest.mark.parametrize("channels", [1, 2, 4])
@pytest.mark.parametrize("window", [1, 2, 3, 16, 61, 1000])
def test_vectorized_matches_loop(rng, channels, window):
    frames = 257
    x = make_interleaved(rng, frames, channels)
    got = moving_average_golden(x, window, channels)
    want = moving_average_golden_loop(x, window, channels)
    np.testing.assert_array_equal(got, want)


def test_window_larger_than_signal(rng):
    x = make_interleaved(rng, 8, 2)
    got = moving_average_golden(x, 100, 2)
    want = moving_average_golden_loop(x, 100, 2)
    np.testing.assert_array_equal(got, want)


def test_window_one_is_identity(rng):
    x = make_interleaved(rng, 100, 2)
    np.testing.assert_array_equal(moving_average_golden(x, 1, 2), x)


def test_trunc_div_matches_c_semantics():
    # C++: -7/2 == -3 (toward zero); NumPy //: -7//2 == -4 (floor).
    num = np.array([-7, 7, -1, 1, 0, -6, 6], dtype=np.int64)
    got = trunc_div(num, 2)
    np.testing.assert_array_equal(got, [-3, 3, 0, 0, 0, -3, 3])


def test_ramp_up_divides_by_full_window():
    # First frames: (sum of available)/window, NOT sum/(i+1)
    # (profilable_moving_averager.cpp:19-25).
    x = np.array([100, 100, 100, 100], dtype=np.int16)
    out = moving_average_golden(x, 4, 1)
    np.testing.assert_array_equal(out, [25, 50, 75, 100])


def test_negative_truncation_end_to_end():
    x = np.array([-3, 0, 0], dtype=np.int16)
    # window sums: -3 (ramp), -3, 0; trunc(/2) -> -1, -1, 0 (floor would give -2)
    out = moving_average_golden(x, 2, 1)
    np.testing.assert_array_equal(out, [-1, -1, 0])


def test_cumsum_golden_segments_channels(rng):
    x = make_interleaved(rng, 50, 3)
    cs = cumsum_per_channel_golden(x, 3)
    planar = x.reshape(50, 3).astype(np.int64)
    np.testing.assert_array_equal(cs.reshape(50, 3), np.cumsum(planar, axis=0))


def test_validation_errors(rng):
    x = make_interleaved(rng, 10, 2)
    with pytest.raises(ValueError):
        moving_average_golden(x, 0, 2)
    with pytest.raises(ValueError):
        moving_average_golden(x, 4, 3)  # 20 % 3 != 0
    with pytest.raises(ValueError):
        moving_average_golden(x.reshape(10, 2), 4, 2)
