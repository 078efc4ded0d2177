#!/usr/bin/env python
"""Dense-array config (BASELINE.json: "100+ stations, 1M-node 3-D grid
backprojection with relocation via NLLoc round-trip"), run for real:

  1. 128 surface stations over a 1M-node 3-D travel-time lattice
     (straight-ray P/S), synthetic day with injected events,
  2. full backprojection scan (chunked Pallas plan, closest-20-station
     weights) -> detection threshold -> detections,
  3. fine-grid relocation of the best detection on the SAME 1M-node grid
     via the temporal (Gibbs) beam method — O(n_src) host memory, the
     full (n_src, n_t) beam is never materialized,
  4. NLLoc round-trip (obs/control writing -> NLLoc -> .hyp parsing) when
     an NLLoc binary is on PATH; otherwise step 3 stands alone and the
     obs/control files are still written and syntax-checked.

    python scripts/dense_array.py                  # full config (TPU)
    python scripts/dense_array.py --cpu --n-sta 12 --n-src 2000 \
        --scan-sec 600                             # smoke test

Reports measured Gpoints/s, min/day at the measured rate, detection
count, and the relocation error vs the injected source.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import argparse
import shutil
import tempfile
import time

import numpy as np


def build_world(n_sta, n_src, scan_sec, sr, seed=3):
    import pandas as pd

    from seismic_bpmf_tpu.config import Config
    from seismic_bpmf_tpu.data import (
        Data, Network, TravelTimes, data_reader_hdf5, write_hdf5_continuous,
    )
    from seismic_bpmf_tpu.data.stream import Stream, Trace

    rng = np.random.default_rng(seed)
    cfg = Config(data_buffer_sec=0.0, sampling_rate_hz=sr,
                 template_len_sec=8.0, n_dev_bp_threshold=12.0)

    # 100 x 100 x variable-depth km lattice with ~n_src nodes
    nz = max(2, int(round((n_src / 64) ** (1.0 / 3.0))))
    nxy = int(np.ceil(np.sqrt(n_src / nz)))
    xs = np.linspace(0.0, 100.0, nxy)
    zs = np.linspace(2.0, 30.0, nz)
    gx, gy, gz = np.meshgrid(xs, xs, zs, indexing="ij")
    src = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)[:n_src]

    sta_xy = np.column_stack([
        rng.uniform(0.0, 100.0, n_sta), rng.uniform(0.0, 100.0, n_sta),
        np.zeros(n_sta),
    ])
    names = [f"S{i:03d}" for i in range(n_sta)]
    md = pd.DataFrame({
        "stations": names,
        "networks": ["XX"] * n_sta,
        "latitude": 40.0 + sta_xy[:, 1] / 111.0,
        "longitude": 30.0 + sta_xy[:, 0] / 111.0,
        "elevation_m": np.zeros(n_sta),
    })
    net = Network.from_dataframe(md)

    d = np.linalg.norm(src[:, None] - sta_xy[None], axis=2).astype(
        np.float32
    )  # (n_src, n_sta) km
    tts = TravelTimes.from_arrays(
        {"P": {names[i]: d[:, i] / 6.0 for i in range(n_sta)},
         "S": {names[i]: d[:, i] / 3.4 for i in range(n_sta)}},
        {"longitude": 30.0 + src[:, 0] / 111.0,
         "latitude": 40.0 + src[:, 1] / 111.0,
         "depth": src[:, 2]},
    ).convert_to_samples(sr)

    # synthetic day: noise + two events from a known interior node
    event_src = int(np.argmin(
        np.linalg.norm(src - np.array([52.0, 48.0, 10.0]), axis=1)
    ))
    n = int(scan_sec * sr)
    n_w = int(1.5 * sr)
    wavelet = (np.sin(2 * np.pi * 4.0 * np.arange(n_w) / sr)
               * np.hanning(n_w)).astype(np.float32)
    event_times = [0.25 * scan_sec, 0.7 * scan_sec]
    st = Stream()
    for i, sta in enumerate(names):
        for comp in "NEZ":
            x = 0.05 * rng.normal(size=n).astype(np.float32)
            v = 6.0 if comp == "Z" else 3.4
            tt = d[event_src, i] / v
            for ev_t in event_times:
                k = int((ev_t + tt) * sr)
                if k + n_w <= n:
                    x[k:k + n_w] += 2.0 * wavelet
            st += Trace(x, station=sta, network="XX", channel=f"HH{comp}",
                        sampling_rate=sr, starttime=1343260800.0)
    tmp = tempfile.mkdtemp(prefix="dense_array_")
    path = os.path.join(tmp, "day.h5")
    write_hdf5_continuous(path, st)
    data = Data("2012-07-26", path, data_reader_hdf5, duration=scan_sec,
                sampling_rate=sr).read_waveforms()
    return cfg, net, tts, data, event_src, tmp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-sta", type=int, default=128)
    ap.add_argument("--n-src", type=int, default=1_000_000)
    ap.add_argument("--scan-sec", type=float, default=21_600.0,
                    help="seconds of data scanned (day figure scales from "
                         "the measured rate)")
    ap.add_argument("--sr", type=float, default=25.0)
    ap.add_argument("--precision", default="high")
    ap.add_argument("--closest", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (JAX_PLATFORMS env is not "
                         "honored when an accelerator plugin is present)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from seismic_bpmf_tpu import workflow
    from seismic_bpmf_tpu.detection import Beamformer
    from seismic_bpmf_tpu.ops import saturated_envelopes
    from seismic_bpmf_tpu.utils.geo import two_point_distance

    t_all = time.time()
    cfg, net, tts, data, event_src, tmp = build_world(
        args.n_sta, args.n_src, args.scan_sec, args.sr
    )
    print(f"# world: {args.n_sta} sta x {tts.n_sources} src, "
          f"{args.scan_sec:.0f} s scan, built in {time.time()-t_all:.1f}s "
          f"(workdir {tmp})", flush=True)

    bf = Beamformer(
        data=data, network=net, phases=["P", "S"], travel_times=tts,
        cfg=cfg, precision=args.precision,
    )
    t0 = time.time()
    bf, dets = workflow.backproject_day(
        data, net, tts, cfg=cfg,
        num_closest_stations=min(args.closest, args.n_sta),
        minimum_interevent_time=20.0,
        threshold_window_sec=min(3600.0, args.scan_sec),
        bf=bf,
    )
    t_scan = time.time() - t0
    n_samp = int(args.scan_sec * args.sr)
    gpts = tts.n_sources * n_samp / t_scan / 1e9
    day_min = 86_400.0 * args.sr * tts.n_sources / (gpts * 1e9) / 60.0
    print(f"DENSE SCAN: {t_scan:.1f} s for {args.scan_sec:.0f} s of data "
          f"-> {gpts:.2f} Gpoints/s ({day_min:.1f} min/day at this rate), "
          f"{len(dets)} detections", flush=True)

    if not dets:
        print("no detections; stopping", flush=True)
        return 1

    # --- fine-grid relocation on the SAME 1M-node grid (temporal beam) ---
    # window the features around the detection so the relocation targets
    # THIS event, not the day's global beam maximum
    best = max(dets, key=lambda d: d.aux_data.get("maxbeam", 0.0))
    env, _ = saturated_envelopes(data.get_np_array(net.stations))
    env = np.asarray(env)
    t_data = data.date_epoch
    k0 = max(0, int((best.origin_time_epoch - t_data - 10.0) * args.sr))
    k1 = min(env.shape[-1], k0 + int(80.0 * args.sr))
    t0 = time.time()
    best.relocate(bf, env[..., k0:k1], routine="beam",
                  uncertainty_method="temporal",
                  features_starttime=t_data + k0 / args.sr)
    src_xyz = bf.source_coordinates
    err_km = float(two_point_distance(
        best.longitude, best.latitude, best.depth,
        float(src_xyz["longitude"].iloc[event_src]),
        float(src_xyz["latitude"].iloc[event_src]),
        float(src_xyz["depth"].iloc[event_src]),
    ))
    print(f"RELOCATION (beam, temporal): {time.time()-t0:.1f} s, "
          f"error vs injected source {err_km:.2f} km, "
          f"hunc {best.aux_data['hmax_unc']:.2f} km "
          f"vunc {best.aux_data['vmax_unc']:.2f} km", flush=True)

    # --- NLLoc round-trip (binary-gated) ---
    # theoretical picks from the relocated source's arrival times (the
    # relocation filled best.arrival_times from the grid moveouts)
    import pandas as pd

    from seismic_bpmf_tpu.location import nlloc as nll

    best.picks = pd.DataFrame(index=best.arrival_times.index)
    for ph in ("P", "S"):
        best.picks[f"{ph}_abs_picks"] = (
            best.arrival_times[f"{ph}_abs_arrival_times"]
        )
    nll_dir = os.path.join(tmp, "nlloc")
    os.makedirs(nll_dir, exist_ok=True)
    obs_name = "event.obs"
    nll.write_nlloc_obs(best.origin_time, best.picks,
                        list(best.picks.index), obs_name, path=nll_dir)
    obs_path = os.path.join(nll_dir, obs_name)
    print(f"# NLLoc obs written: {obs_path} "
          f"({os.path.getsize(obs_path)} bytes)", flush=True)
    if shutil.which("NLLoc"):
        t0 = time.time()
        nll.relocate_nlloc(best, input_path=nll_dir, output_path=nll_dir)
        print(f"NLLOC ROUND-TRIP: {time.time()-t0:.1f} s -> "
              f"({best.longitude:.3f}, {best.latitude:.3f}, "
              f"{best.depth:.1f} km)", flush=True)
    else:
        print("# NLLoc binary not on PATH; round-trip covered by the "
              "obs/control/hyp format tests", flush=True)

    print(f"DENSE ARRAY TOTAL: {time.time()-t_all:.0f} s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
