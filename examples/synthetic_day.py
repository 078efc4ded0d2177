"""End-to-end synthetic example: the full BPMF workflow on one device.

Builds a synthetic "day" (20 stations, 25 Hz) with repeating earthquakes
from one grid source, then runs:

  travel-time tables (device eikonal, homogeneous model)
  -> backprojection detection (Pallas beamformer)
  -> template database
  -> matched-filter densification (Pallas matched filter)
  -> catalog assembly with multiples dedup
  -> moment magnitudes

Run: python examples/synthetic_day.py [--cpu]

--cpu forces the CPU backend (set BEFORE jax initializes — the
accelerator plugin ignores the JAX_PLATFORMS env var); Pallas kernels
then run in interpret mode, so it smoke-tests the workflow off-chip.
"""

import os
import sys

# allow running from a repo checkout without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

import tempfile
import time

import numpy as np
import pandas as pd

from seismic_bpmf_tpu import Config, workflow
from seismic_bpmf_tpu.data import (
    Data,
    Network,
    TravelTimes,
    data_reader_hdf5,
    write_hdf5_continuous,
)
from seismic_bpmf_tpu.data.stream import Stream, Trace

SR = 25.0
DAY = 4.0 * 3600.0  # 4 "hours"
N_STA = 20
N_SRC = 64
EVENT_TIMES = [600.0, 3000.0, 7200.0, 11000.0]
EVENT_SRC = 20


def build_world(tmp):
    rng = np.random.default_rng(42)
    cfg = Config(data_buffer_sec=0.0, sampling_rate_hz=SR,
                 template_len_sec=8.0, n_dev_bp_threshold=12.0,
                 n_dev_mf_threshold=8.0)
    md = pd.DataFrame({
        "stations": [f"S{i:02d}" for i in range(N_STA)],
        "networks": ["XX"] * N_STA,
        "latitude": 40.0 + 0.3 * rng.random(N_STA),
        "longitude": 30.0 + 0.3 * rng.random(N_STA),
        "elevation_m": np.zeros(N_STA),
    })
    net = Network.from_dataframe(md)

    # homogeneous-velocity travel times on a small grid
    from seismic_bpmf_tpu.data.travel_times import grid_travel_times

    lon = np.linspace(30.0, 30.3, 8)
    lat = np.linspace(40.0, 40.3, 8)
    lon_g, lat_g = np.meshgrid(lon, lat, indexing="ij")
    src_lon, src_lat = lon_g.reshape(-1), lat_g.reshape(-1)
    src_dep = np.full(src_lon.size, 8.0)
    tt_p, tt_s = grid_travel_times(
        src_lon, src_lat, src_dep,
        net.longitude, net.latitude, net.depth,
    )
    tts_path = os.path.join(tmp, "tts.h5")
    TravelTimes.write_table(
        tts_path,
        {"P": {s: tt_p[:, i] for i, s in enumerate(net.stations)},
         "S": {s: tt_s[:, i] for i, s in enumerate(net.stations)}},
        {"longitude": src_lon, "latitude": src_lat, "depth": src_dep},
    )

    # synthetic waveforms with injected events
    n = int(DAY * SR)
    n_w = int(2.0 * SR)
    wavelet = (np.sin(2 * np.pi * 4.0 * np.arange(n_w) / SR)
               * np.hanning(n_w))
    st = Stream()
    for i, sta in enumerate(net.stations):
        for comp in "NEZ":
            x = 0.05 * rng.normal(size=n).astype(np.float32)
            for ev_t in EVENT_TIMES:
                tt = (tt_p if comp == "Z" else tt_s)[EVENT_SRC, i]
                k = int((ev_t + tt) * SR)
                x[k : k + n_w] += (2.0 + rng.random()) * wavelet
            st += Trace(x, station=sta, network="XX", channel=f"HH{comp}",
                        sampling_rate=SR, starttime=1343260800.0)
    day_path = os.path.join(tmp, "day.h5")
    write_hdf5_continuous(day_path, st)
    data = Data("2012-07-26", day_path, data_reader_hdf5, duration=DAY,
                sampling_rate=SR).read_waveforms()
    tts = TravelTimes("tts.h5", tmp).read(
        ["P", "S"], read_coords=True).convert_to_samples(SR)
    return cfg, net, data, tts


def main():
    tmp = tempfile.mkdtemp(prefix="bpmf_example_")
    print(f"workdir: {tmp}")
    cfg, net, data, tts = build_world(tmp)

    t0 = time.time()
    bf, detections = workflow.backproject_day(
        data, net, tts, cfg=cfg, minimum_interevent_time=20.0,
        threshold_window_sec=1200.0, num_closest_stations=N_STA,
    )
    print(f"[1] backprojection: {len(detections)} detections "
          f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    tg = workflow.build_templates(
        detections, net, cfg=cfg, data_reader=data_reader_hdf5,
        dedup_similarity=0.9, db_path=os.path.join(tmp, "templates"),
    )
    print(f"[2] template db: {tg.n_templates} templates "
          f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    dets = workflow.matched_filter_day(
        tg, data, cfg=cfg, minimum_interevent_time=10.0,
        threshold_window_dur=1200.0, min_channels=6, min_stations=3,
        max_kurto=1e6, db_path=os.path.join(tmp, "detections"),
    )
    n_total = sum(len(v) for v in dets.values())
    print(f"[3] matched filter: {n_total} detections ({time.time()-t0:.1f}s)")

    cat = workflow.assemble_catalog(dets, tg)
    uniq = cat.catalog[cat.catalog["unique_event"]]
    print(f"[4] catalog: {cat.n_events} rows, {len(uniq)} unique events")

    events = [ev for evs in dets.values() for ev in evs][:3]
    for ev in events:
        ev.read_waveforms(cfg.template_len_sec, data_reader=data_reader_hdf5)
    mws = workflow.compute_magnitudes(events, net)
    print(f"[5] magnitudes on {len(events)} events: {mws}")

    from seismic_bpmf_tpu.utils.observe import GLOBAL_TIMER

    print("stage report:", GLOBAL_TIMER.report())
    assert len(uniq) >= len(EVENT_TIMES), "missed injected events!"
    print("OK: all injected events recovered")


if __name__ == "__main__":
    main()
