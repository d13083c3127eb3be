"""scipy.signal long-tail compat surface: windows, WOLA checks, analog
prototypes/transforms, waveform utilities, order filter, MLS. scipy is
the oracle for every function here."""

import numpy as np
import pytest
import scipy.signal as sps

from digital_signal_processsing_tpu.ops import (
    correlate as corr,
    fft,
    iir_design as iird,
    rank,
    signal as sig,
)


WINDOWS = [
    "boxcar", "triang", "bartlett", "hann", "hamming", "blackman",
    "blackmanharris", "nuttall", "flattop", "barthann", "bohman",
    "parzen", "cosine", "lanczos",
    ("kaiser", 8.6), ("gaussian", 7.0), ("exponential", None, 25.0),
    ("tukey", 0.35),
]


@pytest.mark.parametrize("window", WINDOWS, ids=str)
def test_get_window_matches_scipy(window):
    for n in (16, 17, 64):
        for fftbins in (True, False):
            ref = sps.get_window(window, n, fftbins=fftbins)
            got = fft.get_window(window, n, fftbins=fftbins)
            assert np.allclose(got, ref, atol=1e-10), (n, fftbins)


def test_get_window_validates():
    with pytest.raises(ValueError):
        fft.get_window("nosuch", 16)
    with pytest.raises(ValueError):
        fft.get_window("kaiser", 16)  # missing beta


@pytest.mark.parametrize(
    "window,nperseg,noverlap",
    [
        ("hann", 256, 128),
        ("hann", 256, 100),
        ("boxcar", 100, 0),
        ("hamming", 256, 192),
        (("tukey", 0.25), 128, 64),
        ("blackman", 128, 96),
    ],
    ids=str,
)
def test_cola_nola_match_scipy(window, nperseg, noverlap):
    assert fft.check_cola(window, nperseg, noverlap) == sps.check_COLA(
        window, nperseg, noverlap
    )
    assert fft.check_nola(window, nperseg, noverlap) == sps.check_NOLA(
        window, nperseg, noverlap
    )


def test_czt_points_matches_scipy():
    w = np.exp(-2j * np.pi / 13 * 1.5)
    assert np.allclose(
        fft.czt_points(13, w, 0.5 + 0.1j), sps.czt_points(13, w, 0.5 + 0.1j)
    )
    assert np.allclose(fft.czt_points(8), sps.czt_points(8))


def test_sweep_poly_matches_scipy():
    t = np.linspace(0, 3, 500)
    poly = [0.05, -0.75, 2.5, 1.0]
    ref = sps.sweep_poly(t, np.poly1d(poly), phi=30.0)
    got = np.asarray(sig.sweep_poly(t, poly, phi=30.0))
    assert np.max(np.abs(got - ref)) < 1e-3


def test_unit_impulse_matches_scipy():
    assert np.allclose(np.asarray(sig.unit_impulse(7)), sps.unit_impulse(7))
    assert np.allclose(
        np.asarray(sig.unit_impulse(7, "mid")), sps.unit_impulse(7, "mid")
    )
    assert np.allclose(
        np.asarray(sig.unit_impulse((3, 4), (1, 2))),
        sps.unit_impulse((3, 4), (1, 2)),
    )


def test_max_len_seq_matches_scipy():
    for nb in (4, 7, 10):
        ref, st_r = sps.max_len_seq(nb)
        got, st_g = sig.max_len_seq(nb)
        assert np.array_equal(got, ref) and np.array_equal(st_g, st_r)
    ref, _ = sps.max_len_seq(6, length=37, taps=[4, 1])
    got, _ = sig.max_len_seq(6, length=37, taps=[4, 1])
    assert np.array_equal(got, ref)
    st0 = np.array([1, 0, 1, 1, 0, 1, 0], np.int8)
    ref, st_r = sps.max_len_seq(7, state=st0.copy(), length=50)
    got, st_g = sig.max_len_seq(7, state=st0.copy(), length=50)
    assert np.array_equal(got, ref) and np.array_equal(st_g, st_r)
    with pytest.raises(ValueError):
        sig.max_len_seq(7, state=np.zeros(7))


def test_choose_conv_method_tracks_measured_crossover():
    from digital_signal_processsing_tpu.ops.fir import FIR_FFT_CROSSOVER

    assert corr.choose_conv_method(np.zeros(100000), np.zeros(100)) == "direct"
    assert (
        corr.choose_conv_method(
            np.zeros(100000), np.zeros(FIR_FFT_CROSSOVER + 1)
        )
        == "fft"
    )


def test_order_filter_matches_scipy():
    rng = np.random.default_rng(0)
    x2 = rng.standard_normal((12, 14)).astype(np.float32)
    dom = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    assert np.allclose(
        np.asarray(rank.order_filter(x2, dom, 2)),
        sps.order_filter(x2, dom, 2),
        atol=1e-6,
    )
    x1 = rng.standard_normal(50).astype(np.float32)
    assert np.allclose(
        np.asarray(rank.order_filter(x1, np.ones(5), 2)),
        sps.order_filter(x1, np.ones(5), 2),
        atol=1e-6,
    )
    with pytest.raises(ValueError):
        rank.order_filter(x2, np.ones((2, 3)), 0)


@pytest.mark.parametrize("n", [1, 2, 5, 8])
def test_analog_prototypes_match_scipy(n):
    pairs = [
        (iird.buttap(n), sps.buttap(n)),
        (iird.cheb1ap(n, 1.0), sps.cheb1ap(n, 1.0)),
        (iird.cheb2ap(n, 40.0), sps.cheb2ap(n, 40.0)),
        (iird.ellipap(n, 1.0, 40.0), sps.ellipap(n, 1.0, 40.0)),
    ]
    for (zg, pg, kg), (zr, pr, kr) in pairs:
        pg, pr = np.atleast_1d(pg), np.atleast_1d(pr)
        assert np.allclose(
            sorted(np.round(pg, 8)), sorted(np.round(pr, 8)), atol=1e-6
        )
        assert abs(kg - kr) < 1e-6 * max(1, abs(kr))
    zg, pg, kg = iird.besselap(5)
    zr, pr, kr = sps.besselap(5)
    assert np.allclose(sorted(np.round(pg, 6)), sorted(np.round(pr, 6)), atol=1e-5)
    assert abs(kg - kr) < 1e-6 * abs(kr)


def test_lp_transforms_match_scipy():
    b, a = sps.butter(3, 1.0, analog=True)
    for name, args in [
        ("lp2lp", (2.5,)),
        ("lp2hp", (2.5,)),
        ("lp2bp", (2.5, 0.7)),
        ("lp2bs", (2.5, 0.7)),
    ]:
        bg, ag = getattr(iird, name)(b, a, *args)
        br, ar = getattr(sps, name)(b, a, *args)
        bg, ag, br, ar = (np.atleast_1d(v) for v in (bg, ag, br, ar))
        assert np.allclose(bg / ag[0], br / ar[0], atol=1e-7), name
        assert np.allclose(ag / ag[0], ar / ar[0], atol=1e-7), name
    z, p, k = sps.buttap(4)
    for name, args in [
        ("lp2lp_zpk", (3.0,)),
        ("lp2hp_zpk", (3.0,)),
        ("lp2bp_zpk", (3.0, 1.2)),
        ("lp2bs_zpk", (3.0, 1.2)),
    ]:
        zg, pg, kg = getattr(iird, name)(z, p, k, *args)
        zr, pr, kr = getattr(sps, name)(z, p, k, *args)
        assert np.allclose(sorted(np.round(pg, 8)), sorted(np.round(pr, 8)))
        assert np.isclose(kg, kr), name


def test_bilinear_zpk_matches_scipy():
    z, p, k = sps.buttap(4)
    zg, pg, kg = iird.bilinear_zpk(z, p, k, fs=10.0)
    zr, pr, kr = sps.bilinear_zpk(z, p, k, fs=10.0)
    assert np.allclose(sorted(np.round(pg, 8)), sorted(np.round(pr, 8)))
    assert np.isclose(kg, kr)


def test_tf2sos_freqz_sos_round():
    bd, ad = sps.butter(4, 0.3)
    wg, hg = iird.freqz_sos(iird.tf2sos(bd, ad), worN=256)
    wr, hr = sps.sosfreqz(sps.tf2sos(bd, ad), worN=256)
    assert np.allclose(np.abs(np.asarray(hg)), np.abs(hr), atol=1e-5)


@pytest.mark.parametrize(
    "num,den",
    [([1.0], [1.0, 8.0, 25.0]), ([1.0, 2.0], [1.0, 0.5, 4.0, 1.0])],
)
def test_freqs_family_matches_scipy(num, den):
    assert np.allclose(
        iird.findfreqs(num, den, 15), sps.findfreqs(num, den, 15), rtol=1e-9
    )
    wg, hg = iird.freqs(num, den, worN=50)
    wr, hr = sps.freqs(num, den, worN=50)
    assert np.allclose(wg, wr) and np.allclose(hg, hr)


def test_freqs_zpk_matches_scipy():
    zz, pp = [0.5j, -0.5j], [-1 + 2j, -1 - 2j]
    wg, hg = iird.freqs_zpk(zz, pp, 1.5, worN=40)
    wr, hr = sps.freqs_zpk(zz, pp, 1.5, worN=40)
    assert np.allclose(wg, wr) and np.allclose(hg, hr)


def test_firwin_matches_scipy():
    from digital_signal_processsing_tpu.ops import fir

    cases = [
        dict(numtaps=31, cutoff=0.3),
        dict(numtaps=32, cutoff=0.3),
        dict(numtaps=31, cutoff=0.3, pass_zero=False),
        dict(numtaps=31, cutoff=[0.2, 0.5], pass_zero=False),
        dict(numtaps=31, cutoff=[0.2, 0.5], pass_zero=True),
        dict(numtaps=41, cutoff=[0.1, 0.3, 0.6, 0.8], pass_zero=False),
        dict(numtaps=31, cutoff=0.3, window=("kaiser", 6.0)),
        dict(numtaps=31, cutoff=0.3, window="blackmanharris"),
        dict(numtaps=31, cutoff=3000, fs=16000),
        dict(numtaps=31, cutoff=0.3, scale=False),
        dict(numtaps=21, cutoff=[0.2, 0.6], pass_zero="bandpass"),
        dict(numtaps=21, cutoff=0.4, pass_zero="highpass"),
    ]
    for kw in cases:
        assert np.max(np.abs(fir.firwin(**kw) - sps.firwin(**kw))) < 1e-12, kw
    with pytest.raises(ValueError):
        fir.firwin(20, 0.4, pass_zero=False)  # even taps, passes Nyquist
    with pytest.raises(ValueError):
        fir.firwin(21, [0.5, 0.2])


def test_firwin_2d_matches_scipy():
    from digital_signal_processsing_tpu.ops import fir

    for kw in [
        dict(hsize=(5, 5), window=("hamming", "hamming"), fc=0.3),
        dict(hsize=(7, 5), window=(("kaiser", 5.0), "hann"), fc=0.4),
        dict(hsize=(5, 5), window="hamming", fc=0.3, circular=True),
    ]:
        assert np.max(np.abs(fir.firwin_2d(**kw) - sps.firwin_2d(**kw))) < 1e-12
    with pytest.raises(ValueError):
        fir.firwin_2d((5, 5), ("hamming", "hamming"))  # fc required


def test_find_peaks_cwt_matches_scipy():
    from digital_signal_processsing_tpu.ops import peaks

    for trial in range(4):
        rng = np.random.default_rng(trial)
        x = np.sin(2 * np.pi * np.arange(400) / 40.0)
        x = x + 0.2 * rng.standard_normal(400)
        ref = sps.find_peaks_cwt(x, np.arange(1, 12))
        got = peaks.find_peaks_cwt(x, np.arange(1, 12))
        assert np.array_equal(np.asarray(ref), got), trial
    x = np.sin(2 * np.pi * np.arange(600) / 60.0)
    x = x + 0.3 * np.random.default_rng(9).standard_normal(600)
    ref = sps.find_peaks_cwt(x, np.arange(2, 20), min_snr=2.0, noise_perc=15)
    got = peaks.find_peaks_cwt(x, np.arange(2, 20), min_snr=2.0, noise_perc=15)
    assert np.array_equal(np.asarray(ref), got)


ADVANCED_WINDOWS = [
    ("chebwin", 50),
    ("chebwin", 80),
    ("taylor",),
    ("taylor", 6, 40),
    ("general_gaussian", 1.5, 7),
    ("general_hamming", 0.6),
    ("dpss", 3),
]


@pytest.mark.parametrize("spec", ADVANCED_WINDOWS, ids=str)
def test_advanced_windows_match_scipy(spec):
    for n in (16, 17, 33, 64):
        for fftbins in (True, False):
            ref = sps.get_window(spec, n, fftbins=fftbins)
            got = fft.get_window(spec, n, fftbins=fftbins)
            assert np.max(np.abs(got - ref)) < 1e-8, (spec, n, fftbins)


def test_general_cosine_and_kbd_match_scipy():
    ref = sps.get_window(("general_cosine", [0.5, 0.3, 0.2]), 17)
    got = fft.get_window(("general_cosine", (0.5, 0.3, 0.2)), 17)
    assert np.max(np.abs(got - ref)) < 1e-12
    ref = sps.get_window(("kaiser_bessel_derived", 8.6), 16, fftbins=False)
    got = fft.get_window(("kaiser_bessel_derived", 8.6), 16, fftbins=False)
    assert np.max(np.abs(got - ref)) < 1e-12
    with pytest.raises(ValueError):
        fft.get_window(("kaiser_bessel_derived", 8.6), 16, fftbins=True)


def test_dpss_windows_match_scipy():
    from scipy.signal import windows as spw

    wr, rr = spw.dpss(128, 3.0, Kmax=5, return_ratios=True)
    wg, rg = fft.dpss_windows(128, 3.0, 5, return_ratios=True)
    assert np.max(np.abs(wg - wr)) < 1e-10
    assert np.max(np.abs(rg - rr)) < 1e-10
    with pytest.raises(ValueError):
        fft.dpss_windows(64, 40.0, 1)


def test_multitaper_psd_resolves_and_beats_periodogram_variance():
    rng = np.random.default_rng(0)
    n = 2048
    x = np.sin(2 * np.pi * 0.2 * np.arange(n)) + rng.standard_normal(n)
    p = np.asarray(fft.multitaper_psd(x.astype(np.float32), nw=4.0))
    f = np.linspace(0, 0.5, p.size)
    assert abs(f[np.argmax(p)] - 0.2) < 0.01
    per = np.abs(np.fft.rfft(x)) ** 2 / n
    band = (f > 0.3) & (f < 0.45)
    cv_mt = np.std(p[band]) / np.mean(p[band])
    cv_per = np.std(per[band]) / np.mean(per[band])
    assert cv_mt < 0.5 * cv_per  # the variance reduction is the point
