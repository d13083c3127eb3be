"""ShortTimeFFT class parity vs scipy.signal.ShortTimeFFT."""

import numpy as np
import pytest
import scipy.signal as sps

from digital_signal_processsing_tpu.ops import stft_class as sc


def _rel(a, b):
    return np.max(np.abs(np.asarray(a) - b)) / max(1e-12, np.max(np.abs(b)))


CONFIGS = [
    (8, 3, 20, "onesided", 0),
    (7, 3, 20, "onesided", 0),  # odd window/mfft
    (16, 4, 100, "twosided", 0),
    (16, 5, 64, "centered", 0),
    (8, 3, 50, "onesided", None),
    (8, 3, 50, "onesided", 2),
    (16, 2, 40, "onesided", 0),  # multi-slice left overhang (p_min = -3)
]


@pytest.mark.parametrize("wlen,hop,n,mode,ps", CONFIGS, ids=str)
def test_geometry_stft_istft_match_scipy(wlen, hop, n, mode, ps):
    w = sps.get_window("hann", wlen, fftbins=True)
    ref = sps.ShortTimeFFT(w, hop=hop, fs=10.0, fft_mode=mode, phase_shift=ps)
    mine = sc.ShortTimeFFT(w, hop, 10.0, fft_mode=mode, phase_shift=ps)
    assert mine.p_min == ref.p_min
    assert mine.p_max(n) == ref.p_max(n)
    assert mine.k_min == ref.k_min
    assert mine.k_max(n) == ref.k_max(n)
    assert np.allclose(mine.f, ref.f)
    assert np.allclose(mine.t(n), ref.t(n))
    assert np.allclose(mine.dual_win, ref.dual_win)
    x = np.random.default_rng(0).standard_normal(n)
    assert _rel(mine.stft(x), ref.stft(x)) < 1e-5
    xr = np.asarray(mine.istft(mine.stft(x), k1=n))
    assert np.max(np.abs(xr - x)) < 1e-5  # exact inversion


def test_paddings_subsets_scalings_match_scipy():
    w = sps.get_window("hann", 16, fftbins=True)
    ref = sps.ShortTimeFFT(w, hop=4, fs=1.0)
    mine = sc.ShortTimeFFT(w, 4, 1.0)
    x = np.random.default_rng(1).standard_normal(60)
    for pad in ("zeros", "edge", "even", "odd"):
        assert _rel(
            mine.stft(x, padding=pad), ref.stft(x, padding=pad)
        ) < 1e-5, pad
    assert _rel(mine.stft(x, p0=0, p1=10), ref.stft(x, p0=0, p1=10)) < 1e-5
    for s in ("magnitude", "psd"):
        refs = sps.ShortTimeFFT(w, hop=4, fs=1.0, scale_to=s)
        mines = sc.ShortTimeFFT(w, 4, 1.0, scale_to=s)
        assert _rel(mines.stft(x), refs.stft(x)) < 1e-5
        assert np.allclose(mines.dual_win, refs.dual_win)
        assert mines.scaling == s
    assert _rel(mine.spectrogram(x), ref.spectrogram(x)) < 1e-4
    # batched leading axis, single device call
    xb = np.random.default_rng(2).standard_normal((3, 60))
    sb = np.asarray(mine.stft(xb))
    assert sb.shape[0] == 3
    assert _rel(sb[1], ref.stft(xb[1])) < 1e-5


def test_from_window_matches_scipy():
    x = np.random.default_rng(3).standard_normal(80)
    fr = sps.ShortTimeFFT.from_window("hamming", 8.0, 32, 24)
    fm = sc.ShortTimeFFT.from_window("hamming", 8.0, 32, 24)
    assert fm.hop == fr.hop
    assert _rel(fm.stft(x), fr.stft(x)) < 1e-5


@pytest.mark.parametrize("scaled", [True, False])
def test_closest_dual_window_matches_scipy(scaled):
    w = sps.get_window("hann", 16, fftbins=True)
    dr, ar = sps.closest_STFT_dual_window(
        w, 4, np.ones_like(w), scaled=scaled
    )
    dm, am = sc.closest_STFT_dual_window(w, 4, np.ones_like(w), scaled=scaled)
    assert np.allclose(dm, dr)
    assert np.isclose(am, ar)
    # the result really is a dual: OLA of win*dual at the hop is 1
    prod = w * dm
    cover = np.zeros(4)
    for j in range(0, 16, 4):
        cover += prod[j : j + 4]
    assert np.allclose(cover, 1.0, atol=1e-12)


def test_validation():
    w = np.hanning(16)
    with pytest.raises(ValueError):
        sc.ShortTimeFFT(w, 0, 1.0)
    with pytest.raises(ValueError):
        sc.ShortTimeFFT(w, 4, 1.0, fft_mode="onesided2X")
    with pytest.raises(ValueError):
        sc.ShortTimeFFT(w, 4, 1.0, mfft=8)
    s = sc.ShortTimeFFT(np.hanning(17)[:-1], 4, 1.0)
    with pytest.raises(ValueError):
        s.stft(np.zeros(100), p0=5, p1=5)
    # non-covering window pair is flagged, not silently wrong
    sparse = np.zeros(16)
    sparse[0] = 1.0
    s2 = sc.ShortTimeFFT(sparse, 4, 1.0)
    assert not s2.invertible


def test_istft_default_k1_matches_scipy():
    w = sps.get_window("hann", 16, fftbins=True)
    for n in (60, 64):
        ref = sps.ShortTimeFFT(w, hop=4, fs=1.0)
        mine = sc.ShortTimeFFT(w, 4, 1.0)
        x = np.random.default_rng(0).standard_normal(n)
        xr = ref.istft(ref.stft(x))
        xg = np.asarray(mine.istft(mine.stft(x)))
        assert xg.shape == xr.shape
        assert np.max(np.abs(xg - xr)) < 1e-5
