"""High-level workflow API.

The reference has no CLI or top-level functions — its public API is the
sequence of 11 tutorial notebooks (SURVEY.md section 1, L10).  This module
packages that workflow as functions so a day scan is a few calls:

  backproject_day(...)   notebooks 5-6: features -> beamform -> detections
  build_templates(...)   notebook 7: detections -> template database
  matched_filter_day(...) notebook 8: template scan -> new detections
  assemble_catalog(...)  notebook 9: per-template catalogs -> deduped catalog
  compute_magnitudes(...) notebook 10

Each stage writes/reads the same HDF5 artifacts as the reference, so any
stage can be rerun from the previous stage's files (the reference's
checkpoint/resume model, SURVEY.md section 5).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Sequence

import numpy as np

from .config import Config, DEFAULT_CONFIG
from .data import Catalog, Data, Network, Template, TemplateGroup, TravelTimes
from .detection import Beamformer, MatchedFilter
from .ops import saturated_envelopes
from .utils.observe import GLOBAL_TIMER, logger


def default_weights_phases(n_stations: int, n_components: int = 3,
                           n_phases: int = 2) -> np.ndarray:
    """P on the vertical, S on the horizontals (tutorial convention,
    5_backprojection.ipynb)."""
    w = np.zeros((n_stations, n_components, n_phases), np.float32)
    w[:, 2, 0] = 1.0
    w[:, :2, 1] = 1.0
    return w


def backproject_day(
    data: Data,
    network: Network,
    travel_times: TravelTimes,
    cfg: Config = DEFAULT_CONFIG,
    feature_fn: Optional[Callable] = None,
    phases: Sequence[str] = ("P", "S"),
    num_closest_stations: int = 10,
    minimum_interevent_time: float = 10.0,
    threshold_window_sec: float = 3600.0,
    n_max_stations: Optional[int] = None,
    engine: str = "auto",
    mesh=None,
    precision: str = "high",
    output_file: Optional[str] = None,
    bf: Optional[Beamformer] = None,
):
    """One-day backprojection scan -> list of detected Events.

    feature_fn(data_arr) -> (features, availability); defaults to
    MAD-standardized envelopes.  With a PhaseNet picker use
    `phasenet_feature_fn`.

    Pass a `Beamformer` instance via `bf` to reuse it across days — its
    content-fingerprinted plan cache (compiled kernels + device-resident
    moveouts/weights) then persists, so only the day's features move."""
    with GLOBAL_TIMER.stage("bp_features"):
        arr = data.get_np_array(network.stations)
        if feature_fn is None:
            # stays device-resident; the beamform plan folds it on device
            features, _ = saturated_envelopes(arr)
        else:
            # may return a device array (e.g. phasenet_feature_fn's
            # device path) — keep it resident; the engines accept both
            features = feature_fn(arr)
    if bf is None:
        bf = Beamformer(
            data=data, network=network, phases=list(phases),
            travel_times=travel_times, cfg=cfg, engine=engine, mesh=mesh,
            precision=precision,
        )
    else:
        bf.set_data(data)
    n_feat_comp = int(features.shape[1])
    if n_feat_comp == network.n_components:
        # waveform-derived features (e.g. envelopes): P on vertical,
        # S on horizontals
        w_ph = default_weights_phases(
            network.n_stations, network.n_components, len(phases)
        )
    else:
        # picker probability features: one channel per phase (P, S, ...)
        w_ph = np.zeros(
            (network.n_stations, n_feat_comp, len(phases)), np.float32
        )
        for p in range(min(n_feat_comp, len(phases))):
            w_ph[:, p, p] = 1.0
    bf.set_weights(weights_phases=w_ph)
    bf.set_weights_sources(
        method="closest_stations",
        num_closest_stations=num_closest_stations,
        normalize=True,
    )
    with GLOBAL_TIMER.stage("bp_backproject"):
        bf.backproject(features, reduce="max")
        GLOBAL_TIMER.add("beam_points", float(bf.n_sources) * features.shape[-1])
    with GLOBAL_TIMER.stage("bp_detect"):
        thr = bf.compute_detection_threshold(window_sec=threshold_window_sec)
        detections, peaks, sources = bf.find_detections(
            thr, minimum_interevent_time, n_max_stations=n_max_stations
        )
    logger.info("backprojection: %d detections", len(detections))
    if output_file is not None:
        import h5py

        # "w": the file holds exactly this run's detections — append mode
        # would keep stale higher-numbered groups from a previous partial
        # run of the same day (resume reruns the whole day)
        with h5py.File(output_file, "w") as f:
            for i, ev in enumerate(detections):
                ev.write(os.path.basename(output_file), gid=str(i),
                         hdf5_file=f)
    return bf, detections


def phasenet_feature_fn(model=None, variables=None, device=True, **kwargs):
    """Build a feature_fn that runs the Flax PhaseNet over the day and
    returns (n_sta, 2, n_samp) P/S probabilities as beamforming features.

    With `device=True` (default) the whole day is processed on device in
    one program and the probabilities stay device-resident for the
    beamformer (no per-window host round trips)."""
    from .models import init_phasenet, make_picker
    from .models.phasenet import ps_channels

    if model is None:
        model, variables = init_phasenet()
    if device:
        from .models.phasenet import phasenet_probas_device

        p_idx, s_idx = ps_channels(model)

        def feature_fn(data_arr):
            probas = phasenet_probas_device(model, variables, data_arr,
                                            **kwargs)
            return probas[:, (p_idx, s_idx), :]  # drop the noise class

        return feature_fn

    picker = make_picker(model, variables, **kwargs)

    def feature_fn(data_arr):
        return picker(data_arr)

    return feature_fn


def build_templates(
    detections,
    network: Network,
    cfg: Config = DEFAULT_CONFIG,
    data_reader: Optional[Callable] = None,
    offset_phase: Dict[str, float] = None,
    dedup_distance_km: float = 1.0,
    dedup_similarity: float = 0.9,
    db_path: Optional[str] = None,
) -> TemplateGroup:
    """Detections -> template database with redundancy removal
    (notebook 7 / BPMF/dataset.py:4690-4932)."""
    offset_phase = offset_phase or {"P": 1.0, "S": 4.0}
    templates = []
    for i, ev in enumerate(detections):
        if not hasattr(ev, "traces"):
            ev.read_waveforms(
                cfg.template_len_sec,
                offset_phase=offset_phase,
                time_shifted=True,
                data_reader=data_reader,
            )
        tp = Template.init_from_event(ev)
        tp.set_aux_data({"tid": i})
        tp.id = str(i)
        templates.append(tp)
    tg = TemplateGroup(templates, network)
    if len(templates) > 1:
        cc = tg.compute_intertemplate_cc(
            distance_threshold=max(dedup_distance_km * 5, 5.0)
        )
        keep = np.ones(len(templates), bool)
        for i in range(len(templates)):
            if not keep[i]:
                continue
            for j in range(i + 1, len(templates)):
                if keep[j] and cc.values[i, j] >= dedup_similarity:
                    keep[j] = False
        tg = TemplateGroup(
            [t for t, k in zip(templates, keep) if k], network
        )
        logger.info(
            "template dedup: %d -> %d", len(templates), tg.n_templates
        )
    if db_path is not None:
        os.makedirs(db_path, exist_ok=True)
        for tp in tg.templates:
            tp.write(f"template{tp.tid}.h5", db_path=db_path)
    return tg


def matched_filter_day(
    template_group: TemplateGroup,
    data: Data,
    cfg: Config = DEFAULT_CONFIG,
    minimum_interevent_time: float = 5.0,
    threshold_window_dur: float = 1800.0,
    weights_method: str = "simple",
    weights_kwargs: Optional[Dict] = None,
    mesh=None,
    db_path: Optional[str] = None,
    mf: Optional[MatchedFilter] = None,
    **mf_kwargs,
) -> Dict:
    """One-day matched-filter scan -> {tid: [Events]} (notebook 8).

    Pass a `MatchedFilter` instance via `mf` to reuse it across days —
    its device-resident template plans (filters uploaded once) and
    compiled kernels then persist, so only the day's waveforms move.

    The campaign default precision is 'screen': single-pass bf16 scan
    with margin-widened candidate extraction, then every candidate's CC
    recomputed exactly (float64 host refine) before the detection
    decision — detections carry oracle-precision CC values at ~2x the
    'high' scan rate.  Only the time-dependent threshold keeps the
    screened series' rounding (measured < 0.2%,
    tests/test_kernels.py::test_screen_margin_near_threshold_adversarial).
    Pass precision='high'/'highest' to scan at full precision instead."""
    if mf is None:
        mf_kwargs.setdefault("precision", "screen")
        mf = MatchedFilter(template_group, cfg=cfg, mesh=mesh, **mf_kwargs)
    mf.set_data(data)
    mf.set_weights_channels(method=weights_method, normalize=True,
                            **(weights_kwargs or {}))
    with GLOBAL_TIMER.stage("mf_scan"):
        detections = mf.run_matched_filter_search(
            minimum_interevent_time,
            threshold_window_dur=threshold_window_dur,
        )
        GLOBAL_TIMER.add(
            "cc_samples",
            float(template_group.n_templates)
            * template_group.waveforms_arr.shape[-1]
            * data.n_samples,
        )
    if db_path is not None:
        os.makedirs(db_path, exist_ok=True)
        for tid, evs in detections.items():
            if evs:
                tp = template_group.templates[
                    int(template_group.tindexes.loc[tid])
                ]
                tp.write_detections(evs, db_path=db_path)
    return detections


def assemble_catalog(
    detections: Dict,
    template_group: TemplateGroup,
    dt_criterion: float = 3.0,
    distance_criterion: float = 5.0,
    similarity_criterion: float = 0.33,
) -> Catalog:
    """Merge per-template detections, flag multiples, return the catalog
    (notebook 9 / BPMF/dataset.py:5065-5295)."""
    import pandas as pd

    all_events = [ev for evs in detections.values() for ev in evs]
    if not all_events:
        return Catalog([], [], [], [])
    cat = Catalog.read_from_events(
        all_events, extra_attributes=["cc", "tid"]
    )
    df = cat.catalog.copy()
    df["origin_time_epoch"] = df["origin_time"].values.astype("int64") / 1e9
    flagged = template_group.remove_multiples(
        pd.DataFrame(
            {
                "origin_time": df["origin_time_epoch"],
                "tid": df["tid"].astype(str),
                "cc": df["cc"],
            }
        ),
        dt_criterion=dt_criterion,
        distance_criterion=distance_criterion,
        similarity_criterion=similarity_criterion,
    )
    df = df.sort_values("origin_time_epoch").reset_index(drop=True)
    df["unique_event"] = flagged["unique_event"].values
    return Catalog.read_from_dataframe(df.drop(columns=["origin_time_epoch"]))


def compute_magnitudes(events, network: Network, fallback_mw_star=True,
                       **kwargs):
    """Per-event Mw with Mw* fallback when the fit fails (notebook 10)."""
    from .source import approximate_moment_magnitude, compute_moment_magnitude

    out = []
    for ev in events:
        try:
            spec = compute_moment_magnitude(ev, network, **kwargs)
            mw = getattr(spec, "Mw", None)
            if mw is None and fallback_mw_star:
                mw = approximate_moment_magnitude(ev, network)
            out.append(mw)
        except Exception as e:
            logger.warning("Mw failed for %s: %s", ev.id, e)
            out.append(None)
    return out


def scan_days(
    dates: Sequence,
    make_data: Callable,
    template_group: Optional[TemplateGroup] = None,
    cfg: Config = DEFAULT_CONFIG,
    state_file: Optional[str] = None,
    db_path: Optional[str] = None,
    stage: str = "mf",
    network: Optional[Network] = None,
    travel_times: Optional[TravelTimes] = None,
    **stage_kwargs,
) -> Dict:
    """Multi-day detection campaign with checkpoint/resume.

    The reference runs one POSIX process per day with lock-file-synchronized
    writers (SURVEY.md section 2.4 P6; day loops in notebooks 5 and 8 +
    BPMF/utils.py:1883-1958); here days run sequentially on the chip (or
    sharded over a mesh via `mesh=` in stage_kwargs) and progress is
    checkpointed to a JSON state file so an interrupted campaign resumes
    at the first unfinished day.

    stage='mf' (requires `template_group`) runs `matched_filter_day` and
    returns {date: {tid: [events]}}; stage='bp' (requires `network` +
    `travel_times`) runs `backproject_day` and returns
    {date: [events]}, writing per-day ``raw_bp_<date>.h5`` files under
    `db_path`.  Both keep ONE campaign-persistent engine: plans upload
    once and compiled kernels persist, only each day's waveforms move.

    make_data(date) -> a `Data` instance with waveforms read.  The next
    day's waveforms are read on a background thread while the current day
    computes (the reference's ThreadPool IO, SURVEY.md §2.4 P7).

    Resume contract: the state file records only ``{date:
    {"n_detections": N}}`` — per-day detection COUNTS, not the events.
    Completed days are skipped on resume and their events are NOT
    re-returned in `results`; a lossless resumable campaign must
    therefore persist events as it goes by setting `db_path` (stage='mf'
    writes per-template detection files, stage='bp' per-day raw files).
    Running stage='mf' with a `state_file` but no `db_path` logs a
    warning: a crash-resume would keep the counts and lose the events.
    """
    import json
    from concurrent.futures import ThreadPoolExecutor

    if stage not in ("mf", "bp"):
        raise ValueError(f"stage must be 'mf' or 'bp', got {stage!r}")
    if stage == "mf" and template_group is None:
        raise ValueError("stage='mf' requires template_group")
    if stage == "bp" and (network is None or travel_times is None):
        raise ValueError("stage='bp' requires network and travel_times")

    if state_file is not None and db_path is None:
        # both stages lose completed days' events across a crash-resume:
        # the state keeps counts only, and without db_path neither the
        # mf detection files nor the bp raw_bp_<date>.h5 are written
        logger.warning(
            "scan_days(stage=%r): state_file without db_path — the "
            "state keeps per-day detection counts only; a resumed "
            "campaign skips completed days WITHOUT re-returning their "
            "events.  Set db_path to persist detections for a lossless "
            "resume.", stage,
        )
    done = {}
    if state_file is not None and os.path.isfile(state_file):
        with open(state_file) as f:
            done = json.load(f)
        logger.info("resuming campaign: %d days already done", len(done))
    results: Dict = {}
    todo = [d for d in dates if str(d) not in done]
    pool = ThreadPoolExecutor(max_workers=1)
    fetch = make_data

    if stage == "mf":
        day_kwargs = {
            k: stage_kwargs.pop(k)
            for k in ("minimum_interevent_time", "threshold_window_dur",
                      "weights_method", "weights_kwargs")
            if k in stage_kwargs
        }
        mesh = stage_kwargs.pop("mesh", None)
        # campaign default: 'screen' (bf16 scan + exact per-candidate
        # refine — detection decisions on oracle-precision CC; see
        # matched_filter_day)
        stage_kwargs.setdefault("precision", "screen")
        engine = MatchedFilter(template_group, cfg=cfg, mesh=mesh,
                               **stage_kwargs)

        def fetch(date):
            # normalize AND start the padded device upload on this
            # prefetch thread: the ~260 MB/day transfer then overlaps the
            # previous day's scan (set_data consumes the bundle)
            return engine.preupload_day(make_data(date))

        def run_day(date, data):
            dets = matched_filter_day(
                template_group, data, cfg=cfg, db_path=db_path,
                mf=engine, **day_kwargs,
            )
            return dets, sum(len(v) for v in dets.values())
    else:
        bf_holder = {"bf": None}

        def run_day(date, data):
            out = None
            if db_path is not None:
                os.makedirs(db_path, exist_ok=True)
                out = os.path.join(db_path, f"raw_bp_{date}.h5")
            bf, dets = backproject_day(
                data, network, travel_times, cfg=cfg, output_file=out,
                bf=bf_holder["bf"], **stage_kwargs,
            )
            bf_holder["bf"] = bf
            return dets, len(dets)

    pending = pool.submit(fetch, todo[0]) if todo else None
    for i, date in enumerate(todo):
        key = str(date)
        data = pending.result()
        pending = (pool.submit(fetch, todo[i + 1])
                   if i + 1 < len(todo) else None)
        detections, n = run_day(date, data)
        results[key] = detections
        done[key] = {"n_detections": n}
        if state_file is not None:
            with open(state_file, "w") as f:
                json.dump(done, f)
        logger.info("day %s: %d detections", key, n)
    pool.shutdown(wait=False)
    return results
