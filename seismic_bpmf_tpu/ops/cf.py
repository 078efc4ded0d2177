"""Characteristic functions for detection (device ops).

  - `envelope`: modulus of the analytic signal (Hilbert transform via FFT),
    replacing the ProcessPool-parallel scipy path at
    BPMF/template_search.py:1573-1617 with a single jitted batched FFT.
  - `saturated_envelopes`: MAD-standardized, clipped envelopes + availability
    (BPMF/template_search.py:1525-1570).
  - `kurtosis`: running kurtosis characteristic function, replacing the
    OpenMP kernel at BPMF/libc.c:11-53 with windowed raw-moment sums on the
    VPU (windows are mean-shifted by the global trace mean to preserve f32
    accuracy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def envelope(traces):
    """|analytic signal| along the last axis. traces: (..., n_samp) f32."""
    x = jnp.asarray(traces, jnp.float32)
    n = x.shape[-1]
    xf = jnp.fft.fft(x, axis=-1)
    h = np.zeros(n, dtype=np.float32)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1.0
        h[1 : n // 2] = 2.0
    else:
        h[0] = 1.0
        h[1 : (n + 1) // 2] = 2.0
    analytic = jnp.fft.ifft(xf * jnp.asarray(h), axis=-1)
    return jnp.abs(analytic).astype(jnp.float32)


def saturated_envelopes(
    traces,
    anomaly_threshold: float = 1.0e-11,
    max_dynamic_range: float = 1.0e5,
):
    """MAD-standardized, saturated envelopes + per-station availability.

    Matches `ops.reference.saturated_envelopes` (which mirrors
    BPMF/template_search.py:1525-1570).  The envelope runs on device; the
    median/MAD standardization is a full-length median, computed with
    jnp.median per channel (sort-based, still device-side).
    """
    env = envelope(traces)
    n_sta, n_comp, n_samp = env.shape

    @jax.jit
    def standardize(env):
        missing = env == 0.0
        n_missing = jnp.sum(missing, axis=-1)  # (n_sta, n_comp)
        # medians over the non-missing samples: replace missing with NaN
        env_nan = jnp.where(missing, jnp.nan, env)
        med = jnp.nanmedian(env_nan, axis=-1, keepdims=True)
        mad = jnp.nanmedian(jnp.abs(env_nan - med), axis=-1, keepdims=True)
        std = (env - med) / mad
        std = jnp.where(missing, 0.0, std)
        std = jnp.minimum(std, max_dynamic_range)
        bad = (n_missing > n_samp / 2) | (mad[..., 0] < anomaly_threshold)
        std = jnp.where(bad[..., None], 0.0, std)
        availability = jnp.sum(~bad, axis=-1).astype(jnp.int32)
        return std.astype(jnp.float32), availability

    return standardize(env)


@functools.partial(jax.jit, static_argnames=("w",))
def kurtosis(signal, w: int):
    """Running kurtosis over a trailing window of `w` samples.

    kurto[n] uses samples [n-w, n); output 0 for n < w or window variance
    <= 1e-6.  Matches `ops.reference.kurtosis` (BPMF/libc.c:11-53).
    """
    x = jnp.asarray(signal, jnp.float32)
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    # improve f32 moment accuracy by removing the per-trace mean first
    # (kurtosis is shift-invariant)
    x2d = x2d - jnp.mean(x2d, axis=-1, keepdims=True)
    n = x2d.shape[-1]

    def wsum(y):
        return jax.lax.reduce_window(
            y,
            jnp.float32(0.0),
            jax.lax.add,
            window_dimensions=(1, w),
            window_strides=(1, 1),
            padding="VALID",
        )

    s1 = wsum(x2d)
    s2 = wsum(x2d**2)
    s3 = wsum(x2d**3)
    s4 = wsum(x2d**4)
    wf = jnp.float32(w)
    mu = s1 / wf
    m2 = s2 / wf - mu**2
    m3 = s3 / wf - 3.0 * mu * s2 / wf + 2.0 * mu**3
    m4 = s4 / wf - 4.0 * mu * s3 / wf + 6.0 * mu**2 * s2 / wf - 3.0 * mu**4
    coeff = 1.0 / ((wf - 2.0) * (wf - 3.0))
    k = coeff * ((wf**2 - 1.0) * m4 / jnp.maximum(m2, 1e-30) ** 2
                 - 3.0 * (wf - 1.0) ** 2)
    k = jnp.where(m2 > 1e-6, k, 0.0)
    # kurto[n] uses window ending at n-1 -> windowed value i maps to n = i + w
    out = jnp.zeros_like(x2d)
    out = out.at[:, w:].set(k[:, : n - w])
    return out.reshape(shape).astype(jnp.float32)


def scalar_kurtosis(x):
    """Excess kurtosis of a 1-D series (used for the CC sanity check,
    BPMF/similarity_search.py:633-642 via scipy.stats.kurtosis)."""
    from scipy.stats import kurtosis as scipy_kurtosis

    return float(scipy_kurtosis(np.asarray(x)))
