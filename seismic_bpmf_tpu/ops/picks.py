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

    Behavioral parity with BPMF/utils.py:2039-2094: each pick's timing is
    the probability-weighted mean over the peak's width interval
    [left_ips, right_ips], and its uncertainty is the square root of the
    *unweighted* squared index deviations normalized by the interval's
    probability mass (the reference's formula).  Vectorized over peaks:
    prefix sums turn every interval statistic into an O(1) lookup, so no
    per-peak Python loop.
    """
    kwargs.setdefault("width", 1)
    kwargs.setdefault("prominence", 0.9 * threshold)
    prob = np.asarray(phase_probability, np.float64)
    peaks, props = find_peaks(prob, height=threshold, **kwargs)
    if len(peaks) == 0:
        empty = np.zeros(0)
        return empty, empty.copy(), empty.copy()
    lo = props["left_ips"].astype(np.int64)
    hi = props["right_ips"].astype(np.int64)  # inclusive

    cum_p = np.concatenate([[0.0], np.cumsum(prob)])
    cum_tp = np.concatenate([[0.0], np.cumsum(np.arange(len(prob)) * prob)])
    mass = cum_p[hi + 1] - cum_p[lo]
    mean = (cum_tp[hi + 1] - cum_tp[lo]) / mass

    # closed forms for sum(m) and sum(m^2) over the peak's SHIFTED indexes
    # m = k - lo in [0, n-1]: all terms stay O(width^3), so no
    # catastrophic cancellation at day-scale absolute sample indexes
    # (computing sum(k^2) ~ (8.6e6)^3 directly loses the O(100) deviation
    # entirely in float64)
    n = (hi - lo + 1).astype(np.float64)
    mu = mean - lo
    sum_m = n * (n - 1.0) / 2.0
    sum_m2 = n * (n - 1.0) * (2.0 * n - 1.0) / 6.0
    dev2 = np.maximum(sum_m2 - 2.0 * mu * sum_m + n * mu**2, 0.0)
    std = np.sqrt(dev2 / mass)
    return prob[peaks], mean, std


def _select_trigger(times, probas, uncs, prior, search_win_samp,
                    before=None):
    """One (time, proba, unc) from candidate triggers: the highest
    probability, optionally Gaussian-reweighted toward `prior` and
    restricted to triggers strictly before `before`.  Returns NaNs (and
    the surviving candidate mask) when nothing qualifies."""
    keep = np.ones(len(times), bool) if before is None else times < before
    if not keep.any():
        return (np.nan, np.nan, np.nan), keep
    t, pr, un = times[keep], probas[keep], uncs[keep]
    score = pr
    if prior is not None:
        score = pr * np.exp(
            -((t - prior) ** 2) / (2.0 * search_win_samp**2)
        )
    j = int(np.argmax(score))
    return (float(t[j]), float(pr[j]), float(un[j])), keep


def get_picks(
    picks: pd.DataFrame,
    buffer_length: int = 50,
    prior_knowledge: pd.DataFrame = None,
    search_win_samp: int = 100,
) -> pd.DataFrame:
    """Select one P and one S pick per station.

    Behavioral parity with BPMF/utils.py:2097-2200: triggers inside the
    initial `buffer_length` samples are dropped, the best S trigger is
    chosen first (highest probability, optionally Gaussian-reweighted
    toward a prior), then the best P trigger among those strictly before
    the chosen S.  Input cells hold candidate arrays
    ({P,S}_{picks,probas,unc}); the output holds one float32 scalar per
    cell (NaN where no pick survives).
    """
    phases = ("P", "S")
    cols = ("picks", "probas", "unc")
    cand = {}
    for sta in picks.index:
        by_phase = {}
        for ph in phases:
            t, pr, un = (
                np.atleast_1d(picks.loc[sta, f"{ph}_{c}"]).astype(float)
                for c in cols
            )
            keep = t > int(buffer_length)
            by_phase[ph] = (t[keep], pr[keep], un[keep])
        cand[sta] = by_phase

    prior = {}
    if prior_knowledge is not None:
        for sta in picks.index:
            if sta in prior_knowledge.index:
                prior[sta] = (
                    prior_knowledge.loc[sta, "P"],
                    prior_knowledge.loc[sta, "S"],
                )

    out = {f"{ph}_{c}": [] for ph in phases for c in cols}
    for sta in picks.index:
        prior_p, prior_s = prior.get(sta, (None, None))
        s_pick, _ = _select_trigger(
            *cand[sta]["S"], prior_s, search_win_samp
        )
        p_pick, _ = _select_trigger(
            *cand[sta]["P"], prior_p, search_win_samp,
            before=None if np.isnan(s_pick[0]) else s_pick[0],
        )
        for ph, sel in (("P", p_pick), ("S", s_pick)):
            for c, v in zip(cols, sel):
                out[f"{ph}_{c}"].append(v)
    result = pd.DataFrame(out, index=picks.index.copy())
    return result.astype(np.float32)


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
