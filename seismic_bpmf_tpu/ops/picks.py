"""Phase-pick extraction from ML picker probability series.

Reference parity: BPMF/utils.py:1966-2355 (`normalize_batch`, `find_picks`,
`get_picks`, `_detect_peaks`).  Peak selection runs on host (scipy) over the
small probability series; the sliding Z-score normalization that feeds the
picker is a jittable device op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy.signal import find_peaks


def normalize_batch_np(
    seismogram: np.ndarray,
    normalization_window_sample: int = 3000,
    overlap: float = 0.50,
) -> np.ndarray:
    """Sliding Z-score normalization (Zhu et al. 2019 convention).

    Reference parity: BPMF/utils.py:1966-2036 (including the reflect
    padding, the endpoint window copies and the linear interpolation of the
    window statistics).
    """
    shift = int((1.0 - overlap) * normalization_window_sample)
    num_stations, num_channels, num_time_samples = seismogram.shape
    seis_pad = np.pad(
        seismogram, ((0, 0), (0, 0), (shift, shift)), mode="reflect"
    )
    view = np.lib.stride_tricks.sliding_window_view(
        seis_pad, normalization_window_sample, axis=-1
    )[:, :, ::shift, :]
    sliding_std = np.std(view, axis=-1)
    sliding_mean = np.mean(view, axis=-1)
    num_windows = view.shape[2]
    time = np.linspace(shift, num_time_samples - shift, num_windows)
    sliding_std[:, :, -1] = sliding_std[:, :, -2]
    sliding_mean[:, :, -1] = sliding_mean[:, :, -2]
    sliding_std[:, :, 0] = sliding_std[:, :, 1]
    sliding_mean[:, :, 0] = sliding_mean[:, :, 1]
    sliding_std[sliding_std == 0] = 1
    t_interp = np.arange(num_time_samples)
    std_i = np.stack(
        [np.interp(t_interp, time, s) for s in
         sliding_std.reshape(-1, num_windows)], axis=0
    ).reshape(num_stations, num_channels, num_time_samples)
    mean_i = np.stack(
        [np.interp(t_interp, time, m) for m in
         sliding_mean.reshape(-1, num_windows)], axis=0
    ).reshape(num_stations, num_channels, num_time_samples)
    return (seismogram - mean_i) / std_i


@functools.partial(jax.jit, static_argnames=("window", "shift"))
def _normalize_batch_kernel(x, *, window, shift):
    n_sta, n_cha, n = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (shift, shift)), mode="reflect")

    def wstat(y):
        s = jax.lax.conv_general_dilated(
            y.reshape(-1, 1, y.shape[-1]),
            jnp.ones((1, 1, window), jnp.float32),
            window_strides=(shift,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0]
        return s

    s1 = wstat(xp) / window
    s2 = wstat(xp * xp) / window
    mean = s1
    std = jnp.sqrt(jnp.maximum(s2 - s1 * s1, 0.0))
    num_windows = mean.shape[-1]
    mean = mean.at[:, 0].set(mean[:, 1]).at[:, -1].set(mean[:, -2])
    std = std.at[:, 0].set(std[:, 1]).at[:, -1].set(std[:, -2])
    std = jnp.where(std == 0.0, 1.0, std)
    time = jnp.linspace(shift, n - shift, num_windows)
    t = jnp.arange(n, dtype=jnp.float32)
    mean_i = jax.vmap(lambda m: jnp.interp(t, time, m))(mean)
    std_i = jax.vmap(lambda s: jnp.interp(t, time, s))(std)
    out = (x.reshape(-1, n) - mean_i) / std_i
    return out.reshape(n_sta, n_cha, n)


def normalize_batch(
    seismogram,
    normalization_window_sample: int = 3000,
    overlap: float = 0.50,
):
    """Device version of `normalize_batch_np` (used in front of the jitted
    PhaseNet forward pass)."""
    shift = int((1.0 - overlap) * normalization_window_sample)
    return _normalize_batch_kernel(
        jnp.asarray(seismogram, jnp.float32),
        window=normalization_window_sample,
        shift=shift,
    )


def find_picks(phase_probability, threshold, **kwargs):
    """Peaks above threshold -> (probability, mean sample, std samples).

    Reference parity: BPMF/utils.py:2039-2094 (probability-weighted pick
    mean/uncertainty from the peak width interval).
    """
    kwargs.setdefault("width", 1)
    kwargs.setdefault("prominence", 0.9 * threshold)
    peak_indexes, props = find_peaks(
        phase_probability, height=threshold, **kwargs
    )
    values, means, stds = [], [], []
    for i in range(len(peak_indexes)):
        idx1 = int(props["left_ips"][i])
        idx2 = int(props["right_ips"][i])
        samples = np.arange(idx1, idx2 + 1)
        prob = phase_probability[samples]
        mean = np.sum(samples * prob) / prob.sum()
        std = np.sqrt(np.sum((samples - mean) ** 2) / prob.sum())
        values.append(phase_probability[peak_indexes[i]])
        means.append(mean)
        stds.append(std)
    return (
        np.atleast_1d(np.asarray(values)),
        np.atleast_1d(np.asarray(means)),
        np.atleast_1d(np.asarray(stds)),
    )


def get_picks(
    picks: pd.DataFrame,
    buffer_length: int = 50,
    prior_knowledge: pd.DataFrame = None,
    search_win_samp: int = 100,
) -> pd.DataFrame:
    """Select one P and one S pick per station (S first, then the best P
    before S; optional Gaussian prior reweighting).

    Reference parity: BPMF/utils.py:2097-2200.
    """
    columns = ["_picks", "_probas", "_unc"]
    phases = ["P", "S"]
    p_cols = ["P" + c for c in columns]
    s_cols = ["S" + c for c in columns]
    picks = picks.copy()
    for sta in picks.index:
        if prior_knowledge is not None and sta in prior_knowledge.index:
            prior_P = prior_knowledge.loc[sta, "P"]
            prior_S = prior_knowledge.loc[sta, "S"]
        else:
            prior_P, prior_S = None, None
        for ph in phases:
            arr = np.atleast_1d(picks.loc[sta, f"{ph}_picks"])
            valid = arr > int(buffer_length)
            for col in columns:
                picks.at[sta, f"{ph}{col}"] = np.atleast_1d(
                    picks.loc[sta, f"{ph}{col}"]
                )[valid]
        search_S = len(np.atleast_1d(picks.loc[sta, "S_picks"])) > 0
        search_P = len(np.atleast_1d(picks.loc[sta, "P_picks"])) > 0
        if not search_S:
            for col in s_cols:
                picks.at[sta, col] = np.nan
        if not search_P:
            for col in p_cols:
                picks.at[sta, col] = np.nan
        if search_S:
            probas = np.atleast_1d(picks.loc[sta, "S_probas"])
            if prior_S is None:
                best = int(probas.argmax())
            else:
                tapered = probas * np.exp(
                    -((np.atleast_1d(picks.loc[sta, "S_picks"]) - prior_S) ** 2)
                    / (2.0 * search_win_samp**2)
                )
                best = int(tapered.argmax())
            for col in s_cols:
                picks.at[sta, col] = np.atleast_1d(picks.loc[sta, col])[best]
            if search_P:
                valid_P = (
                    np.atleast_1d(picks.loc[sta, "P_picks"])
                    < picks.loc[sta, "S_picks"]
                )
                for col in p_cols:
                    picks.at[sta, col] = np.atleast_1d(
                        picks.loc[sta, col]
                    )[valid_P]
                if len(np.atleast_1d(picks.loc[sta, "P_picks"])) == 0:
                    for col in p_cols:
                        picks.at[sta, col] = np.nan
                    search_P = False
        if search_P:
            probas = np.atleast_1d(picks.loc[sta, "P_probas"])
            if prior_P is None:
                best = int(probas.argmax())
            else:
                tapered = probas * np.exp(
                    -((np.atleast_1d(picks.loc[sta, "P_picks"]) - prior_P) ** 2)
                    / (2.0 * search_win_samp**2)
                )
                best = int(tapered.argmax())
            for col in p_cols:
                picks.at[sta, col] = np.atleast_1d(picks.loc[sta, col])[best]
    for col in picks:
        picks[col] = np.float32(picks[col])
    return picks


def detect_peaks(
    x,
    mph=None,
    mpd: int = 1,
    threshold: float = 0,
    edge: str = "rising",
    kpsh: bool = False,
    valley: bool = False,
):
    """Amplitude/distance-constrained peak detection.

    Reference parity: BPMF/utils.py:2203-2355 (Duarte's detect_peaks as
    vendored by the reference; used by the beamformer's detection stage).
    """
    x = np.atleast_1d(x).astype("float64")
    if x.size < 3:
        return np.array([], dtype=int)
    if valley:
        x = -x
    dx = x[1:] - x[:-1]
    indnan = np.where(np.isnan(x))[0]
    if indnan.size:
        x[indnan] = np.inf
        dx[np.where(np.isnan(dx))[0]] = np.inf
    ine, ire, ife = np.array([[], [], []], dtype=int)
    if not edge:
        ine = np.where((np.hstack((dx, 0)) < 0) & (np.hstack((0, dx)) > 0))[0]
    else:
        if edge.lower() in ["rising", "both"]:
            ire = np.where(
                (np.hstack((dx, 0)) <= 0) & (np.hstack((0, dx)) > 0)
            )[0]
        if edge.lower() in ["falling", "both"]:
            ife = np.where(
                (np.hstack((dx, 0)) < 0) & (np.hstack((0, dx)) >= 0)
            )[0]
    ind = np.unique(np.hstack((ine, ire, ife)))
    if ind.size and indnan.size:
        ind = ind[
            np.isin(
                ind,
                np.unique(np.hstack((indnan, indnan - 1, indnan + 1))),
                invert=True,
            )
        ]
    if ind.size and ind[0] == 0:
        ind = ind[1:]
    if ind.size and ind[-1] == x.size - 1:
        ind = ind[:-1]
    if ind.size and mph is not None:
        ind = ind[x[ind] >= mph]
    if ind.size and threshold > 0:
        dx2 = np.min(
            np.vstack([x[ind] - x[ind - 1], x[ind] - x[ind + 1]]), axis=0
        )
        ind = np.delete(ind, np.where(dx2 < threshold)[0])
    if ind.size and mpd > 1:
        ind = ind[np.argsort(x[ind])][::-1]
        idel = np.zeros(ind.size, dtype=bool)
        for i in range(ind.size):
            if not idel[i]:
                idel = idel | (ind >= ind[i] - mpd) & (ind <= ind[i] + mpd) & (
                    x[ind[i]] > x[ind] if kpsh else True
                )
                idel[i] = 0
        ind = np.sort(ind[~idel])
    return ind
