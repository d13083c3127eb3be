"""Filter design, spectral estimation and correlation vs scipy oracles.

scipy is used strictly as a TEST oracle (it is not a runtime dependency of
the framework). Frequency-response checks evaluate the designed taps/SOS
directly, so they hold regardless of design-formula implementation details.
"""

import numpy as np
import pytest
import scipy.signal as sps

from digital_signal_processsing_tpu.ops.fir import (
    design_bandpass,
    design_bandstop,
    design_highpass,
    design_lowpass,
    kaiser_beta,
    kaiser_num_taps,
)
from digital_signal_processsing_tpu.ops.iir import design_butterworth, sosfilt


def _fir_mag(h, f):
    w, resp = sps.freqz(h, worN=np.asarray(f) * np.pi)
    return np.abs(resp)


class TestFirDesign:
    def test_lowpass_response(self):
        h = design_lowpass(101, 0.3)
        assert _fir_mag(h, [0.01])[0] == pytest.approx(1.0, abs=1e-3)
        assert _fir_mag(h, [0.6])[0] < 1e-2

    def test_highpass_response(self):
        h = design_highpass(101, 0.3)
        assert _fir_mag(h, [0.99])[0] == pytest.approx(1.0, abs=1e-2)
        assert _fir_mag(h, [0.05])[0] < 1e-2

    def test_bandpass_response(self):
        h = design_bandpass(151, 0.2, 0.5)
        assert _fir_mag(h, [0.35])[0] == pytest.approx(1.0, abs=1e-2)
        assert _fir_mag(h, [0.05])[0] < 1e-2
        assert _fir_mag(h, [0.8])[0] < 1e-2

    def test_bandstop_response(self):
        h = design_bandstop(151, 0.2, 0.5)
        assert _fir_mag(h, [0.01])[0] == pytest.approx(1.0, abs=1e-2)
        assert _fir_mag(h, [0.9])[0] == pytest.approx(1.0, abs=5e-2)
        assert _fir_mag(h, [0.35])[0] < 2e-2

    def test_kaiser_design_meets_attenuation(self):
        atten, width = 60.0, 0.1
        n = kaiser_num_taps(atten, width)
        beta = kaiser_beta(atten)
        h = design_lowpass(n, 0.3, window=("kaiser", beta))
        # stopband starts half a transition width past cutoff
        stop = np.linspace(0.3 + width, 0.99, 50)
        assert _fir_mag(h, stop).max() < 10 ** (-(atten - 5) / 20)

    def test_even_taps_rejected_for_inverted_types(self):
        with pytest.raises(ValueError, match="odd"):
            design_highpass(100, 0.3)
        with pytest.raises(ValueError, match="odd"):
            design_bandstop(100, 0.2, 0.4)

    def test_bad_cutoffs_rejected(self):
        with pytest.raises(ValueError):
            design_lowpass(11, 1.5)
        with pytest.raises(ValueError):
            design_bandpass(11, 0.5, 0.2)


class TestButterworth:
    @pytest.mark.parametrize("order", [1, 2, 3, 4, 5, 8])
    @pytest.mark.parametrize("btype", ["lowpass", "highpass"])
    def test_matches_scipy_response(self, order, btype):
        sos = design_butterworth(order, 0.3, btype)
        ref = sps.butter(order, 0.3, btype=btype, output="sos")
        w, h = sps.sosfreqz(sos.astype(np.float64), worN=256)
        _, href = sps.sosfreqz(ref, worN=256)
        np.testing.assert_allclose(np.abs(h), np.abs(href), atol=2e-5)

    def test_sos_rows_shape(self):
        assert design_butterworth(5, 0.2).shape == (3, 6)
        assert design_butterworth(4, 0.2).shape == (2, 6)

    def test_filter_runs_and_matches_scipy(self, rng):
        x = rng.normal(size=2000).astype(np.float32)
        sos = design_butterworth(4, 0.25)
        got = np.asarray(sosfilt(sos, x))
        want = sps.sosfilt(sos.astype(np.float64), x)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_bad_args_rejected(self):
        with pytest.raises(ValueError):
            design_butterworth(0, 0.3)
        with pytest.raises(ValueError):
            design_butterworth(2, 0.3, "bandpass")


class TestSpectral:
    def test_welch_matches_scipy(self, rng):
        import jax

        from digital_signal_processsing_tpu.ops.fft import welch

        x = rng.normal(size=8192).astype(np.float32)
        got = np.asarray(welch(x, nfft=256))
        f, want = sps.welch(
            x, window="hann", nperseg=256, noverlap=128, detrend=False
        )
        # periodic-hann convention matches scipy; residual is f32 rfft noise
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_welch_finds_tone(self, rng):
        from digital_signal_processsing_tpu.ops.fft import welch

        t = np.arange(16384)
        x = (np.sin(2 * np.pi * 0.125 * t) + 0.01 * rng.normal(size=t.size)).astype(
            np.float32
        )
        p = np.asarray(welch(x, nfft=512))
        assert np.argmax(p) == round(0.125 * 512)

    def test_spectrogram_shape(self, rng):
        from digital_signal_processsing_tpu.ops.fft import spectrogram

        x = rng.normal(size=(3, 4096)).astype(np.float32)
        s = np.asarray(spectrogram(x, nfft=256, hop=128))
        assert s.shape == (3, (4096 - 256) // 128 + 1, 129)
        assert (s >= 0).all()


class TestCorrelate:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_matches_scipy(self, rng, mode):
        from digital_signal_processsing_tpu.ops.correlate import correlate

        a = rng.normal(size=300).astype(np.float32)
        v = rng.normal(size=45).astype(np.float32)
        got = np.asarray(correlate(a, v, mode))
        want = sps.correlate(a, v, mode=mode)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_batched(self, rng):
        from digital_signal_processsing_tpu.ops.correlate import correlate

        a = rng.normal(size=(4, 200)).astype(np.float32)
        v = rng.normal(size=31).astype(np.float32)
        got = np.asarray(correlate(a, v, "full"))
        for i in range(4):
            np.testing.assert_allclose(
                got[i], sps.correlate(a[i], v, "full"), rtol=1e-4, atol=1e-4
            )

    def test_autocorr_lag0_unit(self, rng):
        from digital_signal_processsing_tpu.ops.correlate import autocorrelate

        x = rng.normal(size=(2, 500)).astype(np.float32)
        r = np.asarray(autocorrelate(x, 20))
        np.testing.assert_allclose(r[:, 0], 1.0, rtol=1e-5)
        want = np.correlate(x[0], x[0], "full")[499:520]
        np.testing.assert_allclose(r[0], want / want[0], rtol=1e-3, atol=1e-4)

    def test_find_delay(self, rng):
        from digital_signal_processsing_tpu.ops.correlate import find_delay

        v = rng.normal(size=64).astype(np.float32)
        a = np.zeros(500, np.float32)
        a[137 : 137 + 64] = v
        assert int(find_delay(a, v)) == 137


def test_welch_hop_validation(rng):
    from digital_signal_processsing_tpu.ops.fft import welch

    x = rng.normal(size=1024).astype(np.float32)
    with pytest.raises(ValueError, match="hop"):
        welch(x, nfft=256, hop=0)


class TestFirls:
    @pytest.mark.parametrize(
        "n,bands,des,w",
        [
            (73, [0, 0.3, 0.4, 1], [1, 1, 0, 0], None),
            (101, [0, 0.2, 0.3, 0.6, 0.7, 1], [0, 0, 1, 1, 0, 0], [1, 2, 1]),
            (51, [0, 0.5, 0.6, 1], [1, 0.5, 0, 0], None),  # sloped desired
        ],
    )
    def test_matches_scipy(self, n, bands, des, w):
        from digital_signal_processsing_tpu.ops.fir import design_firls

        got = design_firls(n, bands, des, weights=w)
        want = sps.firls(n, bands, des, weight=w, fs=2.0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_rejections(self):
        from digital_signal_processsing_tpu.ops.fir import design_firls

        with pytest.raises(ValueError, match="odd"):
            design_firls(50, [0, 0.5, 0.6, 1], [1, 1, 0, 0])
        with pytest.raises(ValueError, match="band"):
            design_firls(51, [0.5, 0.2, 0.6, 1], [1, 1, 0, 0])


class TestEquiripple:
    def test_near_minimax_vs_scipy_remez(self):
        from digital_signal_processsing_tpu.ops.fir import (
            design_equiripple,
            design_firls,
        )

        bands, des, n = [0, 0.35, 0.45, 1], [1, 1, 0, 0], 61
        h_eq = design_equiripple(n, bands, des)
        h_ls = design_firls(n, bands, des)
        h_sp = sps.remez(n, [0, 0.35, 0.45, 1], [1, 0], fs=2.0)

        def ripple(h):
            f1 = np.linspace(0.001, 0.35, 400)
            f2 = np.linspace(0.45, 0.999, 400)
            _, r1 = sps.freqz(h, worN=f1 * np.pi)
            _, r2 = sps.freqz(h, worN=f2 * np.pi)
            return max(np.max(np.abs(np.abs(r1) - 1)), np.max(np.abs(r2)))

        # constant-band equiripple now routes through the true Remez
        # exchange: ripple matches scipy's optimum (grid discretization
        # aside) and clearly beats plain LS
        assert ripple(h_eq) < 1.02 * ripple(h_sp)
        assert ripple(h_eq) < 0.6 * ripple(h_ls)


def _remez_specs():
    """20 specs spanning lowpass/highpass/bandpass/bandstop/multiband,
    tap counts 15..201, weighted and unweighted."""
    return [
        (15, [0, 0.3, 0.5, 1], [1, 0], None),
        (21, [0, 0.4, 0.55, 1], [1, 0], [1, 2]),
        (31, [0, 0.3, 0.4, 1], [1, 0], None),
        (33, [0, 0.45, 0.6, 1], [0, 1], None),  # highpass
        (41, [0, 0.2, 0.3, 0.65, 0.75, 1], [0, 1, 0], None),  # bandpass
        (45, [0, 0.15, 0.25, 0.6, 0.7, 1], [1, 0, 1], [1, 3, 1]),  # bandstop
        (51, [0, 0.25, 0.35, 1], [1, 0], [1, 10]),
        (55, [0, 0.05, 0.1, 0.3, 0.35, 1], [0, 1, 0], None),
        (61, [0, 0.35, 0.45, 1], [1, 0], None),
        (63, [0, 0.2, 0.25, 1], [1, 0], [1, 10]),
        (67, [0, 0.5, 0.6, 1], [0, 1], [5, 1]),
        (71, [0, 0.1, 0.2, 0.45, 0.55, 0.8, 0.9, 1], [1, 0, 1, 0], None),
        (75, [0, 0.3, 0.36, 1], [1, 0], None),
        (81, [0, 0.12, 0.2, 0.5, 0.58, 1], [0, 1, 0], [1, 1, 2]),
        (91, [0, 0.42, 0.5, 1], [1, 0], [2, 1]),
        (101, [0, 0.1, 0.15, 0.5, 0.55, 1], [0, 1, 0], None),
        (121, [0, 0.24, 0.28, 1], [1, 0], None),
        (129, [0, 0.4, 0.45, 1], [1, 0], [3, 1]),
        (151, [0, 0.3, 0.33, 1], [1, 0], [1, 4]),
        (201, [0, 0.2, 0.22, 1], [1, 0], None),
    ]


class TestRemez:
    @pytest.mark.parametrize("n,edges,des,w", _remez_specs())
    def test_matches_scipy_remez(self, n, edges, des, w):
        # the true exchange: converged minimax ripple agrees with
        # scipy.signal.remez at matching grid density; residual differences
        # are grid discretization on both sides
        from digital_signal_processsing_tpu.ops.fir import (
            _type1_amplitude,
            design_remez,
        )

        gd = 64
        h = design_remez(n, edges, des, weights=w, grid_density=gd)
        h_sp = sps.remez(
            n, edges, des, weight=w, fs=2.0, grid_density=gd
        )

        def max_ripple(h64):
            worst = 0.0
            pairs = np.asarray(edges, float).reshape(-1, 2)
            wts = np.ones(len(pairs)) if w is None else np.asarray(w, float)
            for (f1, f2), d, wt in zip(pairs, des, wts):
                f = np.linspace(f1, f2, 4000)
                amp = _type1_amplitude(h64, f)
                worst = max(worst, wt * np.max(np.abs(amp - d)))
            return worst

        r_ours = max_ripple(h.astype(np.float64))
        r_sp = max_ripple(h_sp.astype(np.float64))
        assert abs(r_ours - r_sp) <= max(2e-5, 1e-3 * r_sp), (r_ours, r_sp)
        np.testing.assert_allclose(h, h_sp, atol=2e-5)

    def test_rejections(self):
        from digital_signal_processsing_tpu.ops.fir import design_remez

        with pytest.raises(ValueError, match="odd"):
            design_remez(50, [0, 0.5, 0.6, 1], [1, 0])
        with pytest.raises(ValueError, match="band"):
            design_remez(51, [0.5, 0.2, 0.6, 1], [1, 0])
        with pytest.raises(ValueError, match="one amplitude per band"):
            design_remez(51, [0, 0.5, 0.6, 1], [1, 0, 0])


class TestButterworthBand:
    @pytest.mark.parametrize("order", [1, 2, 3, 4])
    @pytest.mark.parametrize("btype", ["bandpass", "bandstop"])
    def test_matches_scipy_response(self, order, btype):
        from digital_signal_processsing_tpu.ops.iir import design_butterworth_band

        sos = design_butterworth_band(order, 0.2, 0.5, btype)
        ref = sps.butter(order, [0.2, 0.5], btype=btype, output="sos")
        w, h = sps.sosfreqz(sos.astype(np.float64), worN=512)
        _, href = sps.sosfreqz(ref, worN=512)
        np.testing.assert_allclose(np.abs(h), np.abs(href), atol=2e-4)

    def test_filter_runs(self, rng):
        from digital_signal_processsing_tpu.ops.iir import (
            design_butterworth_band,
            sosfilt,
        )

        x = rng.normal(size=2000).astype(np.float32)
        sos = design_butterworth_band(3, 0.2, 0.5)
        got = np.asarray(sosfilt(sos, x))
        want = sps.sosfilt(sos.astype(np.float64), x)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_rejections(self):
        from digital_signal_processsing_tpu.ops.iir import design_butterworth_band

        with pytest.raises(ValueError):
            design_butterworth_band(2, 0.5, 0.2)
        with pytest.raises(ValueError):
            design_butterworth_band(2, 0.2, 0.5, "lowpass")


class TestChebyshev:
    @pytest.mark.parametrize("order", [2, 3, 4, 5, 6])
    @pytest.mark.parametrize("btype", ["lowpass", "highpass"])
    def test_cheby1_matches_scipy(self, order, btype):
        from digital_signal_processsing_tpu.ops.iir import design_chebyshev1

        sos = design_chebyshev1(order, 1.0, 0.3, btype)
        ref = sps.cheby1(order, 1.0, 0.3, btype=btype, output="sos")
        w, h = sps.sosfreqz(sos.astype(np.float64), worN=512)
        _, hr = sps.sosfreqz(ref, worN=512)
        np.testing.assert_allclose(np.abs(h), np.abs(hr), atol=1e-5)

    @pytest.mark.parametrize("order", [2, 3, 4, 5, 7, 9, 11])
    @pytest.mark.parametrize("btype", ["lowpass", "highpass"])
    def test_cheby2_matches_scipy(self, order, btype):
        from digital_signal_processsing_tpu.ops.iir import design_chebyshev2

        sos = design_chebyshev2(order, 40.0, 0.4, btype)
        ref = sps.cheby2(order, 40.0, 0.4, btype=btype, output="sos")
        w, h = sps.sosfreqz(sos.astype(np.float64), worN=512)
        _, hr = sps.sosfreqz(ref, worN=512)
        np.testing.assert_allclose(np.abs(h), np.abs(hr), atol=1e-5)

    @pytest.mark.parametrize("order", [6, 7, 9, 10, 11])
    @pytest.mark.parametrize("atten", [20.0, 60.0, 90.0])
    @pytest.mark.parametrize("cutoff", [0.1, 0.55, 0.85])
    def test_cheby2_section_pairing_property(self, order, atten, cutoff):
        """High/odd orders + extreme specs: the real-zero pairing must
        always reproduce scipy's magnitude response (VERDICT r2 weak #7)."""
        from digital_signal_processsing_tpu.ops.iir import design_chebyshev2

        for btype in ("lowpass", "highpass"):
            sos = design_chebyshev2(order, atten, cutoff, btype)
            assert sos.shape == ((order + 1) // 2, 6)
            ref = sps.cheby2(order, atten, cutoff, btype=btype, output="sos")
            w, h = sps.sosfreqz(sos.astype(np.float64), worN=512)
            _, hr = sps.sosfreqz(ref, worN=512)
            np.testing.assert_allclose(np.abs(h), np.abs(hr), atol=2e-5)

    def test_rejections(self):
        from digital_signal_processsing_tpu.ops.iir import (
            design_chebyshev1,
            design_chebyshev2,
        )

        with pytest.raises(ValueError, match="ripple"):
            design_chebyshev1(4, -1.0, 0.3)
        with pytest.raises(ValueError, match="atten"):
            design_chebyshev2(4, 0.0, 0.3)
        with pytest.raises(ValueError, match="cutoff"):
            design_chebyshev1(4, 1.0, 1.5)


class TestIirDesignPipeline:
    """The general zpk pipeline (ops/iir_design.py): every family x band."""

    @pytest.mark.parametrize("ftype", ["butter", "cheby1", "cheby2", "ellip"])
    @pytest.mark.parametrize(
        "btype", ["lowpass", "highpass", "bandpass", "bandstop"]
    )
    @pytest.mark.parametrize("order", [1, 2, 3, 4, 5, 8])
    def test_matches_scipy_iirfilter(self, ftype, btype, order):
        from digital_signal_processsing_tpu.ops.iir_design import iirfilter

        Wn = 0.3 if btype in ("lowpass", "highpass") else [0.2, 0.5]
        kw = {}
        if ftype in ("cheby1", "ellip"):
            kw["rp"] = 1.0
        if ftype in ("cheby2", "ellip"):
            kw["rs"] = 40.0
        sos = iirfilter(order, Wn, btype=btype, ftype=ftype, **kw)
        ref = sps.iirfilter(
            order, Wn, btype=btype, ftype=ftype, output="sos", **kw
        )
        w, h = sps.sosfreqz(sos.astype(np.float64), worN=1024)
        _, hr = sps.sosfreqz(ref, worN=1024)
        np.testing.assert_allclose(np.abs(h), np.abs(hr), atol=5e-5)

    def test_elliptic_wrapper_and_equiripple(self):
        from digital_signal_processsing_tpu.ops.iir_design import design_elliptic

        sos = design_elliptic(5, 0.5, 50.0, 0.35)
        w, h = sps.sosfreqz(sos.astype(np.float64), worN=4096)
        mag = np.abs(h)
        pb = mag[w <= 0.35 * np.pi]
        # passband equiripple within the 0.5 dB spec
        assert pb.min() > 10 ** (-0.55 / 20)
        assert pb.max() < 1.0 + 1e-4
        # stopband: once attenuation first reaches -50 dB it stays there
        # (the transition edge itself comes from the degree equation)
        below = np.nonzero(mag < 10 ** (-50.0 / 20))[0]
        assert below.size, "never reaches the stopband spec"
        edge = below[0]
        assert w[edge] < 0.5 * np.pi  # sane transition width for order 5
        assert mag[edge:].max() < 10 ** (-49.5 / 20)

    @pytest.mark.parametrize("family", ["cheby1", "cheby2"])
    @pytest.mark.parametrize("btype", ["bandpass", "bandstop"])
    def test_cheby_band_types_via_design_functions(self, family, btype):
        from digital_signal_processsing_tpu.ops.iir import (
            design_chebyshev1,
            design_chebyshev2,
        )

        if family == "cheby1":
            sos = design_chebyshev1(3, 1.0, [0.25, 0.6], btype)
            ref = sps.cheby1(3, 1.0, [0.25, 0.6], btype=btype, output="sos")
        else:
            sos = design_chebyshev2(3, 45.0, [0.25, 0.6], btype)
            ref = sps.cheby2(3, 45.0, [0.25, 0.6], btype=btype, output="sos")
        _, h = sps.sosfreqz(sos.astype(np.float64), worN=1024)
        _, hr = sps.sosfreqz(ref, worN=1024)
        np.testing.assert_allclose(np.abs(h), np.abs(hr), atol=5e-5)

    def test_iirfilter_rejections(self):
        from digital_signal_processsing_tpu.ops.iir_design import iirfilter

        with pytest.raises(ValueError, match="rp"):
            iirfilter(4, 0.3, ftype="ellip", rs=40.0)
        with pytest.raises(ValueError, match="rs"):
            iirfilter(4, 0.3, ftype="cheby2")
        with pytest.raises(ValueError, match="ftype"):
            iirfilter(4, 0.3, ftype="legendre")
        with pytest.raises(ValueError, match="Nyquist"):
            iirfilter(4, 1.5)
        with pytest.raises(ValueError, match="low < high"):
            iirfilter(4, [0.5, 0.2], btype="bandpass")


class TestSteadyStateInit:
    def test_lfilter_zi_matches_scipy(self):
        from digital_signal_processsing_tpu.ops.iir import lfilter_zi

        for b, a in [
            sps.butter(4, 0.2),
            sps.cheby1(3, 1.0, 0.3),
            ([1.0, 0.5], [1.0, -0.3]),
        ]:
            np.testing.assert_allclose(
                lfilter_zi(b, a), sps.lfilter_zi(b, a), rtol=1e-10
            )

    def test_sosfilt_zi_matches_scipy(self):
        from digital_signal_processsing_tpu.ops.iir import sosfilt_zi

        sos = sps.butter(6, 0.25, output="sos")
        np.testing.assert_allclose(
            sosfilt_zi(sos), sps.sosfilt_zi(sos), rtol=1e-8
        )

    def test_zi_kills_step_transient(self):
        from digital_signal_processsing_tpu.ops.iir import (
            sosfilt_chunk,
            sosfilt_zi,
        )

        sos = sps.butter(4, 0.2, output="sos")
        zi = sosfilt_zi(sos)  # (n_sections, 2)
        x = np.ones(256, np.float32) * 3.0
        _, y = sosfilt_chunk((zi * 3.0).astype(np.float32), sos, x)
        np.testing.assert_allclose(np.asarray(y), 3.0, rtol=1e-5)


def test_decimate_iir_matches_scipy(rng):
    from digital_signal_processsing_tpu.ops.resample import decimate

    x = rng.normal(size=2000).astype(np.float32)
    for q in [2, 4, 5]:
        got = np.asarray(decimate(x, q, ftype="iir"))
        want = sps.decimate(x.astype(np.float64), q, ftype="iir")
        scale = np.max(np.abs(want))
        # same order-8 cheby1(0.05 dB, 0.8/q) + zero-phase recipe; edges
        # differ by the reflected-padding approximations of each filtfilt
        err = np.max(np.abs(got - want)[5:-5]) / scale
        assert err < 2e-2, (q, err)
    with pytest.raises(ValueError, match="taps"):
        decimate(x, 2, ftype="iir", taps=np.ones(8))
    with pytest.raises(ValueError, match="ftype"):
        decimate(x, 2, ftype="bogus")
