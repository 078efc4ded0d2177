"""Jitted device preprocessing (detrend, taper, bandpass, resample).

Device analogue of the host scipy pipeline (`utils/filters.py`, mirroring
BPMF/utils.py:24-555): once a day of raw data is on the chip it can be
detrended, tapered, zero-phase bandpassed and resampled without a host round
trip, feeding the beamform/matched-filter kernels directly.

The zero-phase bandpass multiplies the spectrum by the squared Butterworth
magnitude response |H(f)|^2 — the frequency-domain equivalent of scipy's
forward-backward `sosfiltfilt` (identical amplitude response; both are
zero-phase).  Resampling is Fourier-domain (scipy.signal.resample
semantics), which is exact for band-limited data after the anti-alias
filter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def detrend_linear(x):
    """Remove per-trace linear trend along the last axis."""
    n = x.shape[-1]
    t = jnp.arange(n, dtype=jnp.float32)
    t_mean = (n - 1) / 2.0
    t_var = jnp.sum((t - t_mean) ** 2)
    x_mean = jnp.mean(x, axis=-1, keepdims=True)
    slope = jnp.sum(
        (t - t_mean) * (x - x_mean), axis=-1, keepdims=True
    ) / t_var
    return x - x_mean - slope * (t - t_mean)


def tukey_taper(n: int, alpha: float = 0.01) -> np.ndarray:
    """Tukey window (host-built constant)."""
    from scipy.signal.windows import tukey

    return tukey(n, alpha=alpha).astype(np.float32)


def _butter_mag2(freqs, freqmin, freqmax, order):
    """Squared magnitude response of an analog Butterworth bandpass."""
    f = np.maximum(np.abs(freqs), 1e-12)
    hp = 1.0 / (1.0 + (freqmin / f) ** (2 * order))
    lp = 1.0 / (1.0 + (f / freqmax) ** (2 * order))
    return (hp * lp).astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("sr", "freqmin", "freqmax", "order",
                              "taper_alpha"),
)
def bandpass_zerophase(
    x, *, sr: float, freqmin: float, freqmax: float, order: int = 4,
    taper_alpha: float = 0.01,
):
    """Zero-phase Butterworth-magnitude bandpass along the last axis.

    x : (..., n_samples) float32.  Detrends, tapers, filters.
    """
    n = x.shape[-1]
    x = detrend_linear(jnp.asarray(x, jnp.float32))
    x = x * jnp.asarray(tukey_taper(n, taper_alpha))
    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
    h2 = jnp.asarray(_butter_mag2(freqs, freqmin, freqmax, order))
    xf = jnp.fft.rfft(x, axis=-1)
    return jnp.fft.irfft(xf * h2, n=n, axis=-1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_out",))
def resample_fourier(x, n_out: int):
    """Fourier-domain resampling to `n_out` samples (scipy.signal.resample
    semantics) along the last axis."""
    n = x.shape[-1]
    xf = jnp.fft.rfft(jnp.asarray(x, jnp.float32), axis=-1)
    n_keep = min(n, n_out) // 2 + 1
    out_f = jnp.zeros(x.shape[:-1] + (n_out // 2 + 1,), xf.dtype)
    out_f = out_f.at[..., :n_keep].set(xf[..., :n_keep])
    return (jnp.fft.irfft(out_f, n=n_out, axis=-1) * (n_out / n)).astype(
        jnp.float32
    )


def preprocess_batch(
    x,
    sr: float,
    freqmin: float,
    freqmax: float,
    target_sr: float = None,
    order: int = 4,
):
    """Full device preprocessing: detrend + taper + zero-phase bandpass +
    (optional) Fourier resampling.

    x : (n_sta, n_comp, n_samples) raw waveforms (host or device array).
    Returns a device array at `target_sr` (or `sr` if None).
    """
    x = bandpass_zerophase(
        x, sr=sr, freqmin=freqmin, freqmax=freqmax, order=order
    )
    if target_sr is not None and target_sr != sr:
        n_out = int(round(x.shape[-1] * target_sr / sr))
        x = resample_fourier(x, n_out)
    return x
