"""Waveform stacking utilities.

`svdwf` reproduces the SVD-Wiener-filtered stack of the reference
(BPMF/utils.py:667-772, after Moreau et al 2017): keep the first
`expl_var`-explaining singular components of the (events x samples) matrix,
Wiener-filter each reconstructed component, and stack.
"""

from __future__ import annotations

import numpy as np
from scipy.linalg import svd
from scipy.signal import wiener

from .filters import max_norm


def svdwf(
    matrix: np.ndarray,
    expl_var: float = 0.4,
    max_singular_values: int = 5,
    freqmin: float = None,
    freqmax: float = None,
    sampling_rate: float = None,
    wiener_filter_colsize: int = None,
) -> np.ndarray:
    """SVD-Wiener-filtered stack of an (n_events, n_samples) matrix.

    Returns the filtered stacked waveform (n_samples,).  On SVD failure the
    reference returns random noise (BPMF/utils.py:714-719) so downstream
    stacking code keeps running; we preserve that resilience behavior.
    """
    try:
        U, S, Vt = svd(matrix, full_matrices=False)
    except Exception:
        return np.random.normal(size=matrix.shape[1]).astype(np.float32)
    if wiener_filter_colsize is None:
        wiener_filter_colsize = U.shape[0]
    var_frac = np.cumsum(S**2) / np.sum(S**2)
    n_keep = int(min(
        max(1, np.searchsorted(var_frac, expl_var) + 1), max_singular_values
    ))
    filtered = np.zeros(matrix.shape[1], dtype=np.float64)
    for k in range(n_keep):
        component = S[k] * np.outer(U[:, k], Vt[k])
        # 2-D Wiener filter over (events, time) smooths incoherent noise
        if component.shape[0] >= 2:
            component = wiener(
                component, mysize=(min(wiener_filter_colsize,
                                       component.shape[0]), 5)
            )
        filtered += component.mean(axis=0)
    if freqmin is not None and freqmax is not None and sampling_rate:
        from .filters import bandpass_filter

        filtered = bandpass_filter(
            filtered.reshape(1, -1),
            freqmin=freqmin,
            freqmax=freqmax,
            f_Nyq=sampling_rate / 2.0,
        )[0]
    return filtered.astype(np.float32)


def fractional_stack(traces: np.ndarray, order: float = 1.0) -> np.ndarray:
    """Linear (order=1) or N-th-root stack along the first axis."""
    if order == 1.0:
        return traces.mean(axis=0)
    signs = np.sign(traces)
    rooted = signs * np.abs(traces) ** (1.0 / order)
    stacked = rooted.mean(axis=0)
    return np.sign(stacked) * np.abs(stacked) ** order
