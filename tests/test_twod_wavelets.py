"""2-D filtering, CWT/Lomb-Scargle, and cepstrum tests.

scipy.signal is the parity oracle where this scipy still ships the
function (convolve2d/correlate2d/medfilt2d/sepfir2d/lombscargle); cwt and
its wavelets were REMOVED from scipy 1.15, so the oracle is a local numpy
transliteration of scipy's documented algorithm (convolve with the
reversed conjugated wavelet, 'same' mode, length = min(10*width, n)).
"""

import numpy as np
import pytest
import scipy.signal as sps

from digital_signal_processsing_tpu.ops import cepstrum, twod, wavelets


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="module")
def img(rng):
    return rng.standard_normal((13, 17)).astype(np.float32)


def test_conv2d_corr2d_full_scipy_grid(img, rng):
    for kshape in [(3, 3), (4, 5), (5, 4), (1, 1), (2, 2), (7, 3)]:
        k = rng.standard_normal(kshape).astype(np.float32)
        for mode in ("full", "same", "valid"):
            for boundary in ("fill", "wrap", "symm"):
                ref = sps.convolve2d(img, k, mode=mode, boundary=boundary)
                got = np.asarray(twod.convolve2d(img, k, mode, boundary))
                assert got.shape == ref.shape, (kshape, mode, boundary)
                assert np.max(np.abs(got - ref)) < 1e-4, (
                    kshape, mode, boundary,
                )
                refc = sps.correlate2d(img, k, mode=mode, boundary=boundary)
                gotc = np.asarray(twod.correlate2d(img, k, mode, boundary))
                assert gotc.shape == refc.shape
                assert np.max(np.abs(gotc - refc)) < 1e-4, (
                    kshape, mode, boundary,
                )


def test_conv2d_fillvalue_and_batch(img, rng):
    k = rng.standard_normal((3, 4)).astype(np.float32)
    ref = sps.convolve2d(img, k, mode="full", boundary="fill", fillvalue=2.5)
    got = np.asarray(twod.convolve2d(img, k, "full", "fill", 2.5))
    assert np.max(np.abs(got - ref)) < 1e-4
    xb = rng.standard_normal((2, 3, 13, 17)).astype(np.float32)
    gotb = np.asarray(twod.convolve2d(xb, k, "same", "symm"))
    refb = sps.convolve2d(xb[1, 2], k, mode="same", boundary="symm")
    assert gotb.shape == (2, 3, 13, 17)
    assert np.max(np.abs(gotb[1, 2] - refb)) < 1e-4


def test_medfilt2d_matches_scipy(img):
    for ks in (3, 5, (3, 5)):
        ref = sps.medfilt2d(img, ks if isinstance(ks, int) else list(ks))
        got = np.asarray(twod.medfilt2d(img, ks))
        assert np.max(np.abs(got - ref)) < 1e-6
    with pytest.raises(ValueError):
        twod.medfilt2d(img, 4)


def test_sepfir2d_matches_scipy(img, rng):
    hr = rng.standard_normal(5)
    hc = rng.standard_normal(7)
    ref = sps.sepfir2d(img.astype(np.float64), hr, hc)
    got = np.asarray(twod.sepfir2d(img, hr, hc))
    assert np.max(np.abs(got - ref)) < 1e-3
    with pytest.raises(ValueError):
        twod.sepfir2d(img, np.ones(4), hc)


def _cwt_ref(data, wavelet, widths, **kw):
    out = []
    for w in widths:
        n = int(min(10 * w, len(data)))
        wd = wavelet(n, w, **kw)
        out.append(np.convolve(data, np.conj(wd)[::-1], mode="same"))
    return np.stack(out)


def test_cwt_ricker_and_morlet(rng):
    x = rng.standard_normal(400).astype(np.float32)
    widths = [1, 3, 7, 15, 50]
    ref = _cwt_ref(x.astype(np.float64), wavelets.ricker, widths)
    got = np.asarray(wavelets.cwt(x, wavelets.ricker, widths))
    assert np.max(np.abs(got - ref)) < 1e-4
    refc = _cwt_ref(x.astype(np.float64), wavelets.morlet2, widths, w=5.0)
    gotc = np.asarray(wavelets.cwt(x, wavelets.morlet2, widths, w=5.0))
    assert np.max(np.abs(gotc - refc)) < 1e-4
    # batch axis
    xb = rng.standard_normal((2, 400)).astype(np.float32)
    gb = np.asarray(wavelets.cwt(xb, wavelets.ricker, widths))
    assert gb.shape == (2, 5, 400)


def test_wavelet_shapes():
    r = wavelets.ricker(101, 7.0)
    assert abs(r.sum()) < 1e-8 and np.argmax(r) == 50
    m = wavelets.morlet2(64, 6.0)
    assert np.argmax(np.abs(m)) in (31, 32)


def test_cwt_localizes_scale(rng):
    # a burst of a 0.05-cycles/sample tone lights up the matching width
    n = 1024
    t = np.arange(n)
    x = np.where(
        (t > 400) & (t < 600), np.sin(2 * np.pi * 0.05 * t), 0.0
    ).astype(np.float32)
    widths = np.arange(1, 16)
    mag = np.abs(np.asarray(wavelets.cwt(x, wavelets.morlet2, widths, w=5.0)))
    best_w = widths[np.argmax(mag.max(-1))]
    # morlet2 center frequency f = w/(2 pi s) -> s = 5/(2 pi 0.05) ~ 15.9
    assert best_w >= 12
    best_t = np.argmax(mag[np.argmax(mag.max(-1))])
    assert 400 < best_t < 600


def test_lombscargle_matches_scipy(rng):
    t = np.sort(rng.uniform(0, 100, 300))
    y = 2.0 * np.sin(2 * np.pi * 0.43 * t + 0.7) + 0.5 * rng.standard_normal(
        300
    )
    freqs = np.linspace(0.05, 5.0, 500) * 2 * np.pi
    for kw in ({}, {"normalize": True}, {"precenter": True}):
        ref = sps.lombscargle(t, y, freqs, **kw)
        got = np.asarray(wavelets.lombscargle(t, y, freqs, **kw))
        assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-3, kw
    pk = freqs[np.argmax(got)] / (2 * np.pi)
    assert abs(pk - 0.43) < 0.02


def test_real_cepstrum_finds_echo(rng):
    n = 1024
    s = sps.lfilter([1.0], [1, -0.6], rng.standard_normal(n))
    echo = np.zeros(n)
    echo[0], echo[200] = 1.0, 0.6
    xe = np.convolve(s, echo)[:n].astype(np.float32)
    c = np.asarray(cepstrum.real_cepstrum(xe))
    assert abs(int(32 + np.argmax(c[32:512])) - 200) <= 2


def test_complex_cepstrum_round_trip(rng):
    x = rng.standard_normal(256).astype(np.float32)
    cc, nd = cepstrum.complex_cepstrum(x)
    back = np.asarray(cepstrum.inverse_complex_cepstrum(cc, nd))
    assert np.max(np.abs(back - x)) / np.max(np.abs(x)) < 1e-3


def test_cepstral_pitch():
    fs = 8000.0
    pt = np.zeros(4096)
    pt[::80] = 1.0  # 100 Hz
    voiced = sps.lfilter(
        [1.0],
        np.poly([0.9 * np.exp(1j * 0.3), 0.9 * np.exp(-1j * 0.3)]).real,
        pt,
    )
    f0 = float(np.asarray(cepstrum.cepstral_pitch(voiced.astype(np.float32), fs=fs)))
    assert abs(f0 - 100.0) < 3.0
