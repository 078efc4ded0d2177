"""Device preprocessing vs scipy reference."""

import numpy as np
import pytest
from scipy.signal import butter, sosfiltfilt

from seismic_bpmf_tpu.ops.signal import (
    bandpass_zerophase,
    detrend_linear,
    preprocess_batch,
    resample_fourier,
)


class TestSignal:
    def test_detrend(self, rng):
        t = np.arange(1000, dtype=np.float32)
        x = 3.0 + 0.01 * t + rng.normal(size=1000).astype(np.float32)
        y = np.asarray(detrend_linear(x[None, :]))[0]
        # residual trend removed
        assert abs(np.polyfit(t, y, 1)[0]) < 1e-6
        assert abs(y.mean()) < 1e-4

    def test_bandpass_matches_filtfilt_amplitude(self, rng):
        sr, n = 100.0, 8192
        x = rng.normal(size=(2, n)).astype(np.float32)
        got = np.asarray(
            bandpass_zerophase(x, sr=sr, freqmin=2.0, freqmax=12.0, order=4)
        )
        sos = butter(4, [2.0, 12.0], btype="bandpass", fs=sr, output="sos")
        want = sosfiltfilt(sos, x, axis=-1)
        # both are zero-phase with the same |H|^2 design intent; compare
        # in-band correlation away from the edges
        sl = slice(500, n - 500)
        for i in range(2):
            c = np.corrcoef(got[i, sl], want[i, sl])[0, 1]
            assert c > 0.98, c

    def test_bandpass_stopband_attenuation(self):
        sr, n = 100.0, 4096
        t = np.arange(n) / sr
        x_pass = np.sin(2 * np.pi * 5.0 * t).astype(np.float32)
        x_stop = np.sin(2 * np.pi * 40.0 * t).astype(np.float32)
        y_pass = np.asarray(
            bandpass_zerophase(x_pass[None], sr=sr, freqmin=2, freqmax=12)
        )[0]
        y_stop = np.asarray(
            bandpass_zerophase(x_stop[None], sr=sr, freqmin=2, freqmax=12)
        )[0]
        sl = slice(200, n - 200)
        assert np.std(y_pass[sl]) > 0.9 * np.std(x_pass[sl])
        assert np.std(y_stop[sl]) < 1e-3 * np.std(x_stop[sl])

    def test_resample(self):
        sr, n = 100.0, 4000
        t = np.arange(n) / sr
        x = np.sin(2 * np.pi * 5.0 * t).astype(np.float32)
        y = np.asarray(resample_fourier(x[None], 1000))[0]
        t4 = np.arange(1000) / 25.0
        want = np.sin(2 * np.pi * 5.0 * t4)
        sl = slice(50, 950)
        np.testing.assert_allclose(y[sl], want[sl], atol=0.02)

    def test_preprocess_batch_shapes(self, rng):
        x = rng.normal(size=(3, 3, 10000)).astype(np.float32)
        y = preprocess_batch(x, sr=100.0, freqmin=2.0, freqmax=12.0,
                             target_sr=25.0)
        assert np.asarray(y).shape == (3, 3, 2500)


class TestStats:
    def test_weighted_linear_regression(self, rng):
        from seismic_bpmf_tpu.utils import weighted_linear_regression

        x = np.linspace(0, 10, 50)
        y = 2.5 * x - 1.0 + rng.normal(scale=0.01, size=50)
        slope, intercept, err = weighted_linear_regression(x, y)
        assert abs(slope - 2.5) < 0.01
        assert abs(intercept + 1.0) < 0.05
        # heavy weights on a subset dominate the fit
        w = np.where(x < 5, 1.0, 1e-6)
        y2 = np.where(x < 5, 3.0 * x, 0.0)
        slope2, _, _ = weighted_linear_regression(x, y2, w)
        assert abs(slope2 - 3.0) < 0.05
        # slope_err is the standard OLS estimate, not the reference's
        # always-~0 sum(resid)**2 quirk (documented divergence)
        assert err > 0.0
        _, _, err_noisy = weighted_linear_regression(
            x, 2.5 * x - 1.0 + rng.normal(scale=1.0, size=50)
        )
        assert err_noisy > 10 * err

    def test_cov_mat_intersection(self):
        from seismic_bpmf_tpu.utils import cov_mat_intersection

        # diagonal covariance: axes align with coordinates
        cov = np.diag([4.0, 1.0, 0.25])
        max_unc, min_unc, az_max, az_min = cov_mat_intersection(cov, 0, 1)
        assert max_unc == pytest.approx(np.sqrt(2.28 * 4.0))
        assert min_unc == pytest.approx(np.sqrt(2.28 * 1.0))
        # max-uncertainty direction is along axis1 => 90 deg from axis2
        assert abs(abs(az_max) - 90.0) < 1e-6

    def test_event_count(self):
        from seismic_bpmf_tpu.utils import event_count

        times = ["2020-01-01T06:00:00", "2020-01-01T18:00:00",
                 "2020-01-02T12:00:00"]
        counts = event_count(times, "2020-01-01", "2020-01-04", freq="1D")
        assert int(counts.sum()) == 3
        # mode='end': events on Jan 1 are indexed at the Jan 2 bin edge
        assert counts[counts.index.strftime("%Y-%m-%d") == "2020-01-02"].iloc[0] == 2

    def test_event_count_offset(self):
        from seismic_bpmf_tpu.utils import event_count

        times = ["2020-01-01T06:00:00", "2020-01-01T18:00:00"]
        # offset=0.5 with '1D': bins run noon to noon, splitting the two
        counts = event_count(times, "2020-01-01", "2020-01-03", freq="1D",
                             offset=0.5)
        assert int(counts.max()) == 1
        # weekly offsets work too (fixed 7-day duration)
        counts_w = event_count(times, "2020-01-01", "2020-03-01",
                               freq="1W", offset=0.5)
        assert int(counts_w.sum()) == 2
        # bare-unit frequency strings ('D', 'W') are valid Grouper freqs
        # and must accept offsets like their '1D'/'1W' forms
        counts_bare = event_count(times, "2020-01-01", "2020-01-03",
                                  freq="D", offset=0.5)
        assert int(counts_bare.max()) == 1
        assert int(counts_bare.sum()) == 2
        # calendar-dependent frequency has no fixed duration: raise
        # instead of silently mis-binning
        with pytest.raises(ValueError, match="calendar"):
            event_count(times, "2020-01-01", "2020-06-01", freq="1ME",
                        offset=0.5)
        # offset=0 with an anchored frequency stays warning-free
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            counts = event_count(times, "2020-01-01", "2020-03-01",
                                 freq="1W")
        assert int(counts.sum()) == 2

    def test_running_mad(self, rng):
        from seismic_bpmf_tpu.utils import running_mad

        x = rng.normal(size=5000).astype(np.float32)
        x[2500] = 100.0  # spike must not drag the MAD threshold up much
        thr = running_mad(x, window=500, n_mad=10.0)
        assert thr.shape == (5000,)
        assert np.all(np.isfinite(thr))
        assert thr.max() < 50.0  # robust to the spike
        assert thr.min() > 1.0   # ~10 * MAD of unit-normal > 1

    def test_spectrogram(self):
        from seismic_bpmf_tpu.utils import spectrogram

        sr = 100.0
        t = np.arange(0, 10, 1 / sr)
        x = np.sin(2 * np.pi * 12.0 * t)
        f, tt, sxx = spectrogram(x, 2.0, 0.5, sr)
        peak_f = f[np.argmax(sxx.mean(axis=1))]
        assert abs(peak_f - 12.0) < 1.0

    def test_catalog_event_count(self):
        from seismic_bpmf_tpu.data.catalog import Catalog

        cat = Catalog(
            [30.0, 30.1, 30.2], [40.0, 40.1, 40.2], [8.0, 9.0, 10.0],
            ["2020-01-01T06:00:00", "2020-01-01T18:00:00",
             "2020-01-02T12:00:00"],
        )
        counts = cat.event_count()
        assert int(counts.sum()) == 3
        # sub-second origin times survive the string round trip: an event
        # 0.4 s before midnight must not be truncated into the next day
        cat2 = Catalog(
            [30.0, 30.1], [40.0, 40.1], [8.0, 9.0],
            ["2020-01-01T23:59:59.6", "2020-01-02T12:00:00"],
        )
        counts2 = cat2.event_count()
        assert counts2[
            counts2.index.strftime("%Y-%m-%d") == "2020-01-02"
        ].iloc[0] == 1
        # empty catalog raises instead of IndexError
        empty = Catalog([], [], [], [])
        with pytest.raises(ValueError, match="empty"):
            empty.event_count()
