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


def fetch_detection_waveforms(
    template,
    filename: str = None,
    db_path: str = "",
    best_cc: bool = False,
    max_n_events: int = 0,
    norm_rms: bool = True,
    ordering: str = "cc",
    flip_order: bool = True,
    unique_events: bool = False,
    duration: float = None,
    offset_phase: dict = None,
    data_reader=None,
    return_event_ids: bool = False,
):
    """Load a template's detection waveforms, selected and ordered by CC.

    Modernized `fetch_detection_waveforms` (BPMF/utils.py:775-866; marked
    deprecated there but the multiplet-stacking entry point): reads the
    template's detection file (one HDF5 group per event, as written by
    `Template.write_detections`), applies the reference's CC-threshold
    ladder (`max_n_events` top events, or `best_cc`'s size-dependent
    percentiles), and returns a dense (n_det, n_sta, n_comp, n_samp)
    array.  Waveforms come from groups saved with `save_waveforms=True`,
    or are re-read from disk when `duration` (+ optionally `data_reader`)
    is given.
    """
    import os

    import h5py

    from ..data.events import Event

    filename = filename or f"detections_tp{template.tid}.h5"
    with h5py.File(os.path.join(db_path, filename), "r") as f:
        # one open handle for the whole read (hundreds of groups for
        # best_cc banks)
        events = [
            Event.read_from_file(hdf5_file=f[g]) for g in sorted(f.keys())
        ]
    ccs = np.array(
        [float(ev.aux_data.get("cc", np.nan)) for ev in events], np.float64
    )
    order_ids = np.arange(len(events))

    cc_sorted = np.sort(ccs[np.isfinite(ccs)])
    if max_n_events > 0 and len(cc_sorted):
        cc_thres = cc_sorted[-min(max_n_events, len(cc_sorted))]
    elif best_cc and len(cc_sorted):
        n = len(cc_sorted)
        if n > 300:
            cc_thres = cc_sorted[-100]
        elif n > 70:
            cc_thres = cc_sorted[int(0.7 * n)]
        elif n > 30:
            cc_thres = float(np.median(cc_sorted))
        elif n > 10:
            cc_thres = float(np.percentile(cc_sorted, 33.0))
        else:
            cc_thres = 0.0
    else:
        cc_thres = -np.inf
    if np.isneginf(cc_thres):
        # no CC selection requested: keep events even when the detection
        # file carries no 'cc' aux value (NaN), like the reference's
        # default threshold of -1.0
        keep = np.ones(len(events), dtype=bool)
    else:
        keep = ccs >= cc_thres
    if unique_events:
        uniq = np.array(
            [bool(ev.aux_data.get("unique_event", True)) for ev in events]
        )
        keep &= uniq
    events = [ev for ev, k in zip(events, keep) if k]
    ccs, order_ids = ccs[keep], order_ids[keep]
    if not events:
        empty = np.empty((0,))
        return ((empty, empty, empty) if return_event_ids
                else (empty, empty))

    arrs = []
    for ev in events:
        if duration is not None:
            if data_reader is not None:
                ev.data_reader = data_reader
            kw = {} if offset_phase is None else {
                "offset_phase": offset_phase
            }
            ev.read_waveforms(duration, time_shifted=True, **kw)
        elif not hasattr(ev, "duration") and getattr(ev, "traces", None):
            # stored-waveform events carry no window duration attribute
            tr = ev.traces[0]
            ev.duration = len(tr.data) / float(tr.stats.sampling_rate)
        arrs.append(ev.waveforms_arr)
    wf = np.stack(arrs, axis=0).astype(np.float32)
    if norm_rms:
        norm = wf.std(axis=(2, 3))[..., None, None]
        norm[norm == 0.0] = 1.0
        wf = wf / norm
    if ordering is not None:
        order = np.argsort(ccs)
        if flip_order:
            order = order[::-1]
        wf, ccs, order_ids = wf[order], ccs[order], order_ids[order]
    if return_event_ids:
        return wf, ccs, order_ids
    return wf, ccs


def svdwf_multiplets(
    template,
    filename: str = None,
    db_path: str = "",
    best_cc: bool = False,
    norm_rms: bool = True,
    max_singular_values: int = 5,
    expl_var: float = 0.4,
    freqmin: float = None,
    freqmax: float = None,
    sampling_rate: float = None,
    wiener_filter_colsize: int = None,
    detection_waveforms: np.ndarray = None,
    **fetch_kwargs,
):
    """SVD-Wiener-filtered stack of a template's detections -> `Stack`.

    Modernized `SVDWF_multiplets` (BPMF/utils.py:986-1110): fetch the
    detection waveforms (or take them via `detection_waveforms`), stack
    each (station, component) panel with `svdwf`, and wrap the result in a
    `data.groups.Stack` carrying the template's moveouts so the stack can
    be repicked like any event.
    """
    from ..data.groups import Stack

    if detection_waveforms is None:
        detection_waveforms, _ = fetch_detection_waveforms(
            template, filename=filename, db_path=db_path, best_cc=best_cc,
            norm_rms=norm_rms, **fetch_kwargs,
        )
    if detection_waveforms.size == 0:
        raise ValueError("no detections to stack")
    sr = sampling_rate or template.sampling_rate
    n_det, n_sta, n_comp, n_samp = detection_waveforms.shape
    stacked = np.zeros((n_sta, n_comp, n_samp), np.float32)
    for s in range(n_sta):
        for c in range(n_comp):
            matrix = detection_waveforms[:, s, c, :]
            if np.allclose(matrix, 0.0):
                continue
            stacked[s, c] = svdwf(
                matrix,
                expl_var=expl_var,
                max_singular_values=max_singular_values,
                freqmin=freqmin,
                freqmax=freqmax,
                sampling_rate=sr,
                wiener_filter_colsize=wiener_filter_colsize,
            )
    return Stack(
        stacked,
        list(template.stations),
        list(template.components),
        sampling_rate=sr,
        phases=list(template.phases),
        moveouts=template.moveouts.values,
    )


def fetch_detection_waveforms_refilter(
    template,
    freqmin: float,
    freqmax: float,
    duration: float,
    filename: str = None,
    db_path: str = "",
    data_reader=None,
    target_sr: float = None,
    integrate: bool = False,
    **fetch_kwargs,
):
    """`fetch_detection_waveforms` variant that re-reads the raw data and
    re-filters it into a new band (modernized BPMF/utils.py:867-983).

    Waveforms are re-read from disk (`duration` seconds, time-shifted),
    bandpass-filtered to [freqmin, freqmax], optionally integrated
    (velocity -> displacement) and resampled to `target_sr`.
    """
    from scipy.signal import decimate, detrend

    from .filters import bandpass_filter

    norm_rms = fetch_kwargs.pop("norm_rms", True)
    wf, ccs = fetch_detection_waveforms(
        template, filename=filename, db_path=db_path, duration=duration,
        data_reader=data_reader, norm_rms=False, **fetch_kwargs,
    )
    if wf.size == 0:
        return wf, ccs
    sr = float(template.sampling_rate)
    shp = wf.shape
    flat = detrend(wf.reshape(-1, shp[-1]).astype(np.float64), axis=-1)
    if integrate:
        flat = np.cumsum(flat, axis=-1) / sr
        flat = detrend(flat, axis=-1)
    flat = bandpass_filter(
        flat, freqmin=freqmin, freqmax=freqmax, f_Nyq=sr / 2.0
    )
    if target_sr is not None and target_sr < sr:
        q = int(round(sr / target_sr))
        flat = decimate(flat, q, axis=-1, zero_phase=True)
    out = flat.reshape(shp[:-1] + (flat.shape[-1],)).astype(np.float32)
    if norm_rms:
        norm = out.std(axis=(2, 3))[..., None, None]
        norm[norm == 0.0] = 1.0
        out = out / norm
    return out, ccs
