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

        # within 1.5x of the true minimax, and clearly better than plain LS
        assert ripple(h_eq) < 1.5 * ripple(h_sp)
        assert ripple(h_eq) < 0.6 * ripple(h_ls)


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
