#!/usr/bin/env python
"""Measured 1024-template x 1-year campaign through `workflow.scan_days`
(the BASELINE.json "Large bank: 1000 templates x 1 year" config — run for
real, not extrapolated).

A full synthetic day (10 stations x 3 comps x 86400 s @ 25 Hz, two
injected events) lives on disk as the native HDF5 day file; every
campaign "day" re-reads it on the prefetch thread, re-normalizes,
re-uploads, scans the 1024-template bank (device CC + batched
threshold/top-k extraction), and builds detection Events — the same
code path a production campaign runs.  State checkpoints to
`--state`, so an interrupted run resumes at the first unfinished day.

    python scripts/year_scan.py --days 365 --state /tmp/year_state.json
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import argparse
import copy
import tempfile
import time

import numpy as np


def build_world(tmp, n_sta=10, sr=25.0, day_sec=86400.0, seed=0):
    import pandas as pd

    from seismic_bpmf_tpu.config import Config
    from seismic_bpmf_tpu.data import (
        Data, Network, data_reader_hdf5, write_hdf5_continuous,
    )
    from seismic_bpmf_tpu.data.stream import Stream, Trace

    rng = np.random.default_rng(seed)
    cfg = Config(data_buffer_sec=0.0, sampling_rate_hz=sr,
                 template_len_sec=8.0, n_dev_mf_threshold=8.0)
    md = pd.DataFrame({
        "stations": [f"S{i}" for i in range(n_sta)],
        "networks": ["XX"] * n_sta,
        "latitude": 40.0 + 0.05 * np.arange(n_sta),
        "longitude": 30.0 + 0.05 * np.arange(n_sta),
        "elevation_m": np.zeros(n_sta),
    })
    net = Network.from_dataframe(md)
    n = int(day_sec * sr)
    n_w = int(1.5 * sr)
    wavelet = (np.sin(2 * np.pi * 4.0 * np.arange(n_w) / sr)
               * np.hanning(n_w))
    event_times = [0.16 * day_sec, 0.6 * day_sec]
    mv_p = {f"S{i}": 1.0 + 0.35 * i for i in range(n_sta)}
    st = Stream()
    for i in range(n_sta):
        sta = f"S{i}"
        for comp in "NEZ":
            x = 0.05 * rng.normal(size=n).astype(np.float32)
            for ev_t in event_times:
                tt = mv_p[sta] * (1.0 if comp == "Z" else 1.7)
                k = int((ev_t + tt) * sr)
                x[k:k + n_w] += 4.0 * wavelet
            st += Trace(x, station=sta, network="XX",
                        channel=f"HH{comp}", sampling_rate=sr,
                        starttime=1343260800.0)
    day_file = os.path.join(tmp, "day.h5")
    write_hdf5_continuous(day_file, st)

    def make_data(date):
        return Data("2012-07-26", day_file, data_reader_hdf5,
                    duration=day_sec, sampling_rate=sr).read_waveforms()

    return cfg, net, make_data, event_times, mv_p


def build_bank(cfg, net, make_data, event_times, mv_p, n_tp):
    """Template bank: real time-shifted reads for one template per
    injected event, then tid-distinct copies up to `n_tp` (the plan cache
    fingerprints content, so the bank uploads once)."""
    from seismic_bpmf_tpu.data import Template, TemplateGroup
    from seismic_bpmf_tpu.data.events import Event
    from seismic_bpmf_tpu.data.readers import data_reader_hdf5

    data = make_data("seed")
    base = []
    for ev_t in event_times:
        mv = np.array(
            [[mv_p[s], mv_p[s] * 1.7] for s in net.stations], np.float32
        )
        ev = Event(
            np.datetime64(int((1343260800.0 + ev_t) * 1e9), "ns"), mv,
            list(net.stations), ["P", "S"],
            data_filename=os.path.basename(str(data.where)),
            data_path=os.path.dirname(str(data.where)),
            sampling_rate=data.sr, data_reader=data_reader_hdf5,
        )
        ev.read_waveforms(cfg.template_len_sec,
                          offset_phase={"P": 1.0, "S": 2.0},
                          time_shifted=True)
        base.append(Template.init_from_event(ev))
    templates = []
    for tid in range(n_tp):
        tp = copy.deepcopy(base[tid % len(base)])
        tp.set_aux_data({"tid": tid})
        tp.id = str(tid)
        templates.append(tp)
    return TemplateGroup(templates, net)


def churn_wrapper(make_data, net, n_patterns):
    """Availability churn: each day drops 1-2 stations (pattern chosen by
    day index modulo `n_patterns`; pass n_patterns >= days for unique-
    per-day churn) and rolls the waveforms by a pattern-dependent shift,
    then recomputes per-channel availability.  With
    weights_method='closest_stations' every new pattern changes the
    channel weights -> new plan CRCs -> full filter rebuild + re-upload,
    the production cost a frictionless replayed-day campaign never pays
    (reference per-day weight refresh:
    BPMF/similarity_search.py:423-474 + BPMF/dataset.py:5010-5035)."""
    stations = list(net.stations)

    def make(date):
        d = int("".join(ch for ch in str(date) if ch.isdigit()) or 0)
        pat = d % max(n_patterns, 1)
        rng = np.random.default_rng(10_000 + pat)
        data = make_data(date)
        drop = rng.choice(len(stations), size=1 + pat % 2, replace=False)
        dropped = {stations[i] for i in drop}
        shift = int(rng.integers(0, 20_000))
        for tr in data.traces:
            if tr.stats.station in dropped:
                tr.data = np.zeros_like(tr.data)
            elif shift:
                tr.data = np.roll(tr.data, shift)
        data.set_availability(stations)
        return data

    return make


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=int, default=365)
    ap.add_argument("--templates", type=int, default=1024)
    ap.add_argument("--state", default="/tmp/year_state.json")
    ap.add_argument("--precision", default="screen")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--day-sec", type=float, default=86400.0,
                    help="shorten for smoke tests")
    ap.add_argument("--churn", type=int, default=0, metavar="N",
                    help="station-availability churn with N distinct "
                         "patterns (N >= days -> unique per day; days "
                         "then use weights_method='closest_stations' so "
                         "each pattern rebuilds + re-uploads the filter "
                         "bank)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (JAX_PLATFORMS env is not "
                         "honored when an accelerator plugin is present)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from seismic_bpmf_tpu import workflow

    tmp = args.workdir or tempfile.mkdtemp(prefix="year_scan_")
    os.makedirs(tmp, exist_ok=True)
    print(f"# workdir {tmp}", flush=True)
    t0 = time.time()
    cfg, net, make_data, event_times, mv_p = build_world(
        tmp, day_sec=args.day_sec
    )
    tg = build_bank(cfg, net, make_data, event_times, mv_p,
                    args.templates)
    print(f"# world + {tg.n_templates}-template bank built in "
          f"{time.time()-t0:.1f}s", flush=True)

    dates = [f"day{d:03d}" for d in range(args.days)]
    day_fn, extra = make_data, {}
    if args.churn > 0:
        day_fn = churn_wrapper(make_data, net, args.churn)
        extra = dict(weights_method="closest_stations",
                     weights_kwargs={"num_closest_stations": 8})
        print(f"# churn: {args.churn} availability patterns, "
              f"closest-station weights", flush=True)
    t0 = time.time()
    results = workflow.scan_days(
        dates, day_fn, tg, cfg=cfg, state_file=args.state,
        minimum_interevent_time=5.0, threshold_window_dur=1800.0,
        min_channels=3, min_stations=2, max_kurto=1e6,
        precision=args.precision, **extra,
    )
    wall = time.time() - t0
    n_days = len(results)
    n_det = sum(
        sum(len(v) for v in day.values()) for day in results.values()
    )
    print(f"YEAR SCAN: {n_days} days in {wall:.0f} s "
          f"({wall/max(n_days,1):.2f} s/day), {n_det} detections "
          f"({n_det/max(n_days,1):.0f}/day)", flush=True)
    n_corr = 86400 * 25
    gmacs = (args.templates * 30 * n_corr * 200) / (wall / max(n_days, 1)) / 1e9
    print(f"sustained (incl. IO/upload/event building): "
          f"{gmacs:.0f} GMAC/s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
