"""scipy parity: rank/Wiener filters, savgol, firwin2, detrend, csd family,
filtfilt/group_delay — the round-3 analysis-surface additions."""

import numpy as np
import pytest
import scipy.ndimage as ndi
import scipy.signal as sps

from digital_signal_processsing_tpu.ops.fft import (
    coherence,
    csd,
    periodogram,
)
from digital_signal_processsing_tpu.ops.fir import (
    design_firwin2,
    design_savgol,
    savgol_filter,
)
from digital_signal_processsing_tpu.ops.gain import detrend
from digital_signal_processsing_tpu.ops.iir import (
    design_butterworth,
    filtfilt,
    group_delay,
    sos_group_delay,
)
from digital_signal_processsing_tpu.ops.rank import medfilt, rank_filter, wiener


@pytest.fixture
def sig(rng):
    return rng.normal(size=1000).astype(np.float32)


@pytest.mark.parametrize("k", [3, 5, 9, 15])
def test_medfilt_matches_scipy(sig, k):
    got = np.asarray(medfilt(sig, k))
    want = sps.medfilt(sig.astype(np.float64), k)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_medfilt_planar_and_flat_agree(rng):
    x = rng.normal(size=(3, 500)).astype(np.float32)
    got = np.asarray(medfilt(x, 5))
    for c in range(3):
        np.testing.assert_array_equal(got[c], np.asarray(medfilt(x[c], 5)))


@pytest.mark.parametrize("rank", [0, 1, 2, 4])
def test_rank_filter_matches_ndimage(sig, rank):
    got = np.asarray(rank_filter(sig, 5, rank))
    want = ndi.rank_filter(sig.astype(np.float64), rank, size=5,
                           mode="constant", cval=0.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("noise", [None, 0.5])
def test_wiener_matches_scipy(sig, noise):
    got = np.asarray(wiener(sig, 5, noise=noise))
    want = sps.wiener(sig.astype(np.float64), 5, noise=noise)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("type_", ["linear", "constant"])
def test_detrend_matches_scipy(sig, type_):
    got = np.asarray(detrend(sig, type=type_))
    want = sps.detrend(sig.astype(np.float64), type=type_)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_detrend_kills_a_ramp(rng):
    t = np.arange(2000, dtype=np.float32)
    x = 3.0 + 0.01 * t + rng.normal(size=2000).astype(np.float32) * 0.1
    r = np.asarray(detrend(x))
    assert abs(r.mean()) < 1e-3
    assert abs(np.polyfit(t, r, 1)[0]) < 1e-6


@pytest.mark.parametrize(
    "wl,po,deriv,mode",
    [
        (11, 3, 0, "interp"),
        (11, 3, 0, "mirror"),
        (11, 3, 0, "nearest"),
        (11, 3, 0, "wrap"),
        (11, 3, 0, "constant"),
        (21, 4, 0, "interp"),
        (11, 3, 1, "interp"),
        (15, 5, 2, "mirror"),
    ],
)
def test_savgol_filter_matches_scipy(sig, wl, po, deriv, mode):
    got = np.asarray(savgol_filter(sig, wl, po, deriv=deriv, mode=mode))
    want = sps.savgol_filter(sig.astype(np.float64), wl, po, deriv=deriv,
                             mode=mode)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_savgol_coeffs_match_scipy():
    for wl, po, d in [(5, 2, 0), (11, 3, 0), (21, 4, 1), (15, 5, 3)]:
        got = design_savgol(wl, po, deriv=d, delta=0.25)
        want = sps.savgol_coeffs(wl, po, deriv=d, delta=0.25)
        np.testing.assert_allclose(got, want, atol=1e-10)


def test_savgol_planar(rng):
    x = rng.normal(size=(4, 300)).astype(np.float32)
    got = np.asarray(savgol_filter(x, 11, 3))
    want = sps.savgol_filter(x.astype(np.float64), 11, 3, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_savgol_validation():
    with pytest.raises(ValueError):
        design_savgol(10, 3)  # even window
    with pytest.raises(ValueError):
        design_savgol(5, 7)  # order >= window


@pytest.mark.parametrize(
    "numtaps,freq,gain",
    [
        (65, [0.0, 0.3, 0.5, 1.0], [1.0, 1.0, 0.0, 0.0]),
        (33, [0.0, 0.5, 1.0], [0.0, 1.0, 0.0]),
        (64, [0.0, 0.4, 0.6, 1.0], [1.0, 1.0, 0.0, 0.0]),
        (101, [0.0, 0.2, 0.2, 0.8, 1.0], [1.0, 1.0, 0.5, 0.5, 0.0]),
    ],
)
def test_firwin2_matches_scipy(numtaps, freq, gain):
    got = design_firwin2(numtaps, freq, gain)
    want = sps.firwin2(numtaps, freq, gain)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_firwin2_validation():
    with pytest.raises(ValueError):
        design_firwin2(64, [0, 0.5, 1.0], [1, 1, 1])  # type II nonzero Nyquist
    with pytest.raises(ValueError):
        design_firwin2(65, [0.1, 1.0], [1, 0])  # must start at 0


def test_periodogram_matches_scipy(sig):
    f, want = sps.periodogram(sig.astype(np.float64), detrend="constant")
    got = np.asarray(periodogram(sig))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_csd_self_is_welch(sig):
    from digital_signal_processsing_tpu.ops.fft import welch

    got = np.asarray(csd(sig, sig, nfft=256)).real
    want = np.asarray(welch(sig, nfft=256))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_csd_matches_scipy(rng, sig):
    y = rng.normal(size=1000).astype(np.float32)
    f, want = sps.csd(sig.astype(np.float64), y.astype(np.float64),
                      nperseg=256, noverlap=128, detrend=False)
    got = np.asarray(csd(sig, y, nfft=256))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)


def test_coherence_matches_scipy(rng, sig):
    y = (0.7 * sig + 0.3 * rng.normal(size=1000)).astype(np.float32)
    f, want = sps.coherence(sig.astype(np.float64), y.astype(np.float64),
                            nperseg=256, noverlap=128, detrend=False)
    got = np.asarray(coherence(sig, y, nfft=256))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)
    assert got.min() >= 0.0 and got.max() <= 1.0 + 1e-6


def test_filtfilt_matches_scipy_interior(sig):
    b, a = sps.butter(4, 0.3)
    got = np.asarray(filtfilt(b, a, sig))
    want = sps.filtfilt(b, a, sig.astype(np.float64))
    np.testing.assert_allclose(got[50:-50], want[50:-50], rtol=1e-3,
                               atol=1e-5)


def test_group_delay_matches_scipy():
    b, a = sps.butter(4, 0.3)
    w, want = sps.group_delay((b, a), w=512)
    w2, got = group_delay(b, a, 512)
    np.testing.assert_allclose(w2, w)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_sos_group_delay_matches_tf_form():
    sos = design_butterworth(6, 0.25)
    b, a = sps.butter(6, 0.25)
    _, want = sps.group_delay((b, a), w=512)
    _, got = sos_group_delay(sos, 512)
    # away from the Nyquist-side numerator null the cascade and tf forms
    # agree tightly; near the null the tf form is itself ill-conditioned
    np.testing.assert_allclose(got[:480], want[:480], atol=1e-3)
