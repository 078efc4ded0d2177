#!/usr/bin/env python
"""Measured 1-month two-step workflow with PhaseNet features (the
BASELINE.json "Full two-step workflow" config, run for real):

  1. train a synthetic PhaseNet picker on device (~30 s),
  2. BP campaign: 30 days x 10 stations over a ~10k-source travel-time
     grid with device-resident PhaseNet P/S probability features
     (scan_days stage='bp', resumable),
  3. build the template bank from day-0 detections,
  4. MF campaign: the same 30 days against that bank (scan_days
     stage='mf', resumable),
  5. assemble the catalog with multi-detection dedup.

    python scripts/month_workflow.py --days 30
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import argparse
import tempfile
import time

import numpy as np


def build_world(tmp, n_sta=10, n_src=10_000, sr=25.0, day_sec=86400.0,
                seed=0):
    import pandas as pd

    from seismic_bpmf_tpu.config import Config
    from seismic_bpmf_tpu.data import (
        Data, Network, TravelTimes, data_reader_hdf5,
        write_hdf5_continuous,
    )
    from seismic_bpmf_tpu.data.stream import Stream, Trace

    rng = np.random.default_rng(seed)
    cfg = Config(data_buffer_sec=0.0, sampling_rate_hz=sr,
                 template_len_sec=8.0, n_dev_bp_threshold=10.0,
                 n_dev_mf_threshold=8.0)
    md = pd.DataFrame({
        "stations": [f"S{i}" for i in range(n_sta)],
        "networks": ["XX"] * n_sta,
        "latitude": 40.0 + 0.05 * rng.random(n_sta),
        "longitude": 30.0 + 0.05 * rng.random(n_sta),
        "elevation_m": np.zeros(n_sta),
    })
    net = Network.from_dataframe(md)

    # ~n_src straight-ray travel-time lattice in a 50 km box
    nxy = int(np.ceil(np.sqrt(n_src / 10)))
    xs, ys = np.meshgrid(np.linspace(0, 50, nxy),
                         np.linspace(0, 50, nxy), indexing="ij")
    zs = np.linspace(2, 20, 10)
    src = np.stack([
        np.repeat(xs.ravel(), len(zs))[:n_src],
        np.repeat(ys.ravel(), len(zs))[:n_src],
        np.tile(zs, xs.size)[:n_src],
    ], axis=1)
    sta_xy = np.column_stack([
        rng.uniform(0, 50, n_sta), rng.uniform(0, 50, n_sta),
        np.zeros(n_sta),
    ])
    d = np.linalg.norm(src[:, None] - sta_xy[None], axis=2)
    tt_p = {f"S{i}": (d[:, i] / 6.0).astype(np.float32)
            for i in range(n_sta)}
    tt_s = {f"S{i}": (d[:, i] / 3.4).astype(np.float32)
            for i in range(n_sta)}
    TravelTimes.write_table(
        os.path.join(tmp, "tts.h5"), {"P": tt_p, "S": tt_s},
        {"longitude": 30.0 + src[:, 0] / 111.0,
         "latitude": 40.0 + src[:, 1] / 111.0,
         "depth": src[:, 2]},
    )
    tts = TravelTimes("tts.h5", tmp).read(
        ["P", "S"], read_coords=True
    ).convert_to_samples(sr)

    event_src = n_src // 3
    n = int(day_sec * sr)
    n_w = int(1.5 * sr)
    wavelet = (np.sin(2 * np.pi * 4.0 * np.arange(n_w) / sr)
               * np.hanning(n_w))
    event_times = [0.2 * day_sec, 0.65 * day_sec]

    day_files = {}

    def make_data(date):
        # one file per distinct date, generated on first use (the
        # prefetch thread pays this, like real disk IO)
        path_cached = os.path.join(tmp, f"{date}.h5")
        if date not in day_files and os.path.exists(path_cached):
            day_files[date] = path_cached  # reuse across a resume
        if date not in day_files:
            # stable per-date seed (hash() is randomized per process, which
            # would regenerate different waveforms across a resume)
            import zlib

            drng = np.random.default_rng(zlib.crc32(date.encode()))
            st = Stream()
            for i in range(n_sta):
                sta = f"S{i}"
                for comp in "NEZ":
                    x = 0.05 * drng.normal(size=n).astype(np.float32)
                    for ev_t in event_times:
                        tt = (tt_p if comp == "Z" else tt_s)[sta][event_src]
                        k = int((ev_t + tt) * sr)
                        x[k:k + n_w] += 3.0 * wavelet
                    st += Trace(x, station=sta, network="XX",
                                channel=f"HH{comp}", sampling_rate=sr,
                                starttime=1343260800.0)
            path = os.path.join(tmp, f"{date}.h5")
            write_hdf5_continuous(path, st)
            day_files[date] = path
        return Data("2012-07-26", day_files[date], data_reader_hdf5,
                    duration=day_sec, sampling_rate=sr).read_waveforms()

    return cfg, net, tts, make_data, wavelet


def train_picker(wavelet, n_train=256, n_epochs=6):
    """Quick synthetic picker training on device with the in-repo trainer
    (windows built at the campaign's 25 Hz with the injected wavelet)."""
    from seismic_bpmf_tpu.models import train_phasenet
    from seismic_bpmf_tpu.models.phasenet import WINDOW

    rng = np.random.default_rng(5)
    n_w = len(wavelet)
    xs, picks = [], []
    for _ in range(n_train):
        x = 0.05 * rng.normal(size=(WINDOW, 3)).astype(np.float32)
        p_at = int(rng.integers(200, WINDOW // 2))
        s_at = p_at + int(rng.integers(100, 900))
        x[p_at:p_at + n_w, 2] += 3.0 * wavelet
        x[s_at:s_at + n_w, :2] += 3.0 * wavelet[:, None]
        std = x.std(axis=0, keepdims=True)
        x = (x - x.mean(axis=0, keepdims=True)) / np.where(
            std > 0, std, 1.0
        )
        xs.append(x)
        picks.append([p_at, s_at])
    model, variables, losses = train_phasenet(
        np.stack(xs), np.asarray(picks, np.float32),
        n_epochs=n_epochs, batch_size=32, learning_rate=1e-3, sigma=10.0,
    )
    print(f"# picker trained, loss {losses[0]:.4f} -> {losses[-1]:.4f}",
          flush=True)
    return model, variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=int, default=30)
    ap.add_argument("--n-src", type=int, default=10_000)
    ap.add_argument("--day-sec", type=float, default=86400.0)
    ap.add_argument("--precision", default="screen")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--no-phasenet", action="store_true",
                    help="use envelope features (smoke tests)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (JAX_PLATFORMS env is not "
                         "honored when an accelerator plugin is present)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from seismic_bpmf_tpu import workflow
    from seismic_bpmf_tpu.data.readers import data_reader_hdf5

    tmp = args.workdir or tempfile.mkdtemp(prefix="month_wf_")
    os.makedirs(tmp, exist_ok=True)
    print(f"# workdir {tmp}", flush=True)
    t_all = time.time()
    cfg, net, tts, make_data, wavelet = build_world(
        tmp, n_src=args.n_src, day_sec=args.day_sec
    )
    print(f"# world built in {time.time()-t_all:.1f}s", flush=True)

    feature_fn = None
    if not args.no_phasenet:
        t0 = time.time()
        model, variables = train_picker(wavelet)
        feature_fn = workflow.phasenet_feature_fn(model, variables,
                                                  device=True)
        print(f"# picker ready in {time.time()-t0:.1f}s", flush=True)

    dates = [f"day{d:02d}" for d in range(args.days)]
    t0 = time.time()
    bp_results = workflow.scan_days(
        dates, make_data, cfg=cfg, stage="bp", network=net,
        travel_times=tts, state_file=os.path.join(tmp, "bp_state.json"),
        db_path=tmp,
        feature_fn=feature_fn, minimum_interevent_time=20.0,
        threshold_window_sec=3600.0, num_closest_stations=len(net.stations),
        # 'screen' is an MF-engine mode (bf16 scan + exact candidate
        # refine); the BP stage scans at 'high'
        precision=("high" if args.precision == "screen"
                   else args.precision),
    )
    t_bp = time.time() - t0
    n_bp = sum(len(v) for v in bp_results.values())
    print(f"BP CAMPAIGN: {len(bp_results)} days in {t_bp:.0f} s "
          f"({t_bp/max(len(bp_results),1):.1f} s/day), "
          f"{n_bp} detections", flush=True)

    t0 = time.time()
    day0 = bp_results.get(dates[0])
    if day0 is None:
        # resumed campaign: day 0 was checkpointed in a previous run, so
        # scan_days didn't re-run it — load its detections from the
        # per-day BP database file instead
        import h5py

        from seismic_bpmf_tpu.data import Event

        day0_file = os.path.join(tmp, f"raw_bp_{dates[0]}.h5")
        with h5py.File(day0_file, "r") as f:
            gids = sorted(f.keys(), key=lambda g: int(g))
        day0 = [
            Event.read_from_file(day0_file, gid=g) for g in gids
        ]
    for ev in day0:
        ev.data_reader = data_reader_hdf5
    tg = workflow.build_templates(
        day0, net, cfg=cfg, data_reader=data_reader_hdf5,
        dedup_similarity=0.9,
    )
    print(f"# template bank: {tg.n_templates} templates "
          f"({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    mf_results = workflow.scan_days(
        dates, make_data, tg, cfg=cfg,
        state_file=os.path.join(tmp, "mf_state.json"),
        minimum_interevent_time=5.0, threshold_window_dur=1800.0,
        min_channels=3, min_stations=2, max_kurto=1e6,
        precision=args.precision,
    )
    t_mf = time.time() - t0
    n_mf = sum(
        sum(len(v) for v in day.values()) for day in mf_results.values()
    )
    print(f"MF CAMPAIGN: {len(mf_results)} days in {t_mf:.0f} s "
          f"({t_mf/max(len(mf_results),1):.1f} s/day), "
          f"{n_mf} detections", flush=True)

    all_dets = {}
    for day in mf_results.values():
        for tid, evs in day.items():
            all_dets.setdefault(tid, []).extend(evs)
    cat = workflow.assemble_catalog(all_dets, tg)
    n_uniq = (int(cat.catalog["unique_event"].sum())
              if "unique_event" in cat.catalog.columns else cat.n_events)
    print(f"CATALOG: {cat.n_events} events, {n_uniq} unique", flush=True)
    print(f"MONTH WORKFLOW TOTAL: {time.time()-t_all:.0f} s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
