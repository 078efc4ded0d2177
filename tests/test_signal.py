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
