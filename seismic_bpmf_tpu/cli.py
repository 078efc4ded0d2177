"""Command-line interface.

The reference has no CLI — its workflow is driven by 11 notebooks
(SURVEY.md section 1).  This module exposes the `workflow` functions as
``python -m seismic_bpmf_tpu <command>`` so a full campaign can run headless
on a TPU host:

  info            device/backend/library report
  backproject     one-day beamforming scan (native HDF5 continuous data)
  matched-filter  one-day template-matching scan
  scan            multi-day matched-filter campaign with JSON checkpoint/resume
  catalog         merge per-template detection files into a deduped catalog
  bench           run the repo benchmark (same JSON line as bench.py)

Data files use the native HDF5 continuous format (`data.readers`), networks
use the reference TSV format, travel times use the reference/pykonal HDF5
contract, and template/detection databases use the reference Event schema —
so artifacts are interchangeable with a reference installation.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from typing import List, Optional


def _load_cfg(path: Optional[str]):
    from .config import Config, DEFAULT_CONFIG

    return Config.from_file(path) if path else DEFAULT_CONFIG


def _load_network(path: str):
    from .data import Network

    return Network(os.path.basename(path),
                   network_path=os.path.dirname(path)).read()


def _make_data(path: str, cfg):
    """Build a Data window spanning the whole native-HDF5 file."""
    import h5py
    import numpy as np

    from .data import Data
    from .data.readers import data_reader_hdf5

    with h5py.File(path, "r") as f:
        start = str(f.attrs["starttime"])
        sr = float(f.attrs["sampling_rate"])
        n = max(
            f["waveforms"][sta][cha].shape[0]
            for sta in f["waveforms"]
            for cha in f["waveforms"][sta]
        )
    data = Data(
        date=np.datetime64(start),
        where=path,
        data_reader=data_reader_hdf5,
        duration=n / sr,
        sampling_rate=sr,
    )
    data.read_waveforms()
    return data


def _expand(paths: List[str]) -> List[str]:
    out: List[str] = []
    for p in paths:
        hits = sorted(glob.glob(p))
        out.extend(hits if hits else [p])
    return out


def _load_templates(paths: List[str], network):
    from .data import TemplateGroup

    tg = TemplateGroup.read_from_files(_expand(paths), network)
    tg.read_waveforms()
    tg.normalize()
    return tg


# ---------------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------------

def cmd_info(args) -> int:
    import jax

    import seismic_bpmf_tpu as pkg
    from .ops import host_ops

    report = {
        "version": getattr(pkg, "__version__", "dev"),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "host_ops_native": host_ops.available(),
    }
    print(json.dumps(report, indent=2))
    return 0


def cmd_backproject(args) -> int:
    from .data import TravelTimes
    from .workflow import backproject_day, phasenet_feature_fn

    cfg = _load_cfg(args.config)
    network = _load_network(args.network)
    data = _make_data(args.data, cfg)
    tts = TravelTimes(os.path.basename(args.travel_times),
                      tt_folder_path=os.path.dirname(args.travel_times))
    tts.read(list(args.phases), read_coords=True,
             stations=list(network.stations))
    tts.convert_to_samples(cfg.sampling_rate_hz)
    feature_fn = None
    if args.picker_checkpoint:
        from .models import init_phasenet, load_variables

        model, variables = init_phasenet()
        variables = load_variables(args.picker_checkpoint, target=variables)
        feature_fn = phasenet_feature_fn(model, variables)
    _, detections = backproject_day(
        data, network, tts, cfg=cfg, feature_fn=feature_fn,
        phases=list(args.phases), engine=args.engine,
        precision=args.precision,
        minimum_interevent_time=args.min_interevent_time,
        threshold_window_sec=args.threshold_window,
        output_file=args.output,
    )
    print(f"{len(detections)} detections"
          + (f" -> {args.output}" if args.output else ""))
    return 0


def cmd_matched_filter(args) -> int:
    from .workflow import matched_filter_day

    cfg = _load_cfg(args.config)
    network = _load_network(args.network)
    data = _make_data(args.data, cfg)
    tg = _load_templates(args.templates, network)
    detections = matched_filter_day(
        tg, data, cfg=cfg,
        minimum_interevent_time=args.min_interevent_time,
        threshold_window_dur=args.threshold_window,
        min_channels=args.min_channels, min_stations=args.min_stations,
        max_kurto=args.max_kurto, precision=args.precision,
        db_path=args.db,
    )
    n = sum(len(v) for v in detections.values())
    print(f"{n} detections across {tg.n_templates} templates"
          + (f" -> {args.db}" if args.db else ""))
    return 0


def cmd_scan(args) -> int:
    from .workflow import scan_days

    cfg = _load_cfg(args.config)
    network = _load_network(args.network)
    tg = _load_templates(args.templates, network)
    days = _expand(args.data)

    def make_data(day_path):
        return _make_data(day_path, cfg)

    results = scan_days(
        days, make_data, tg, cfg=cfg,
        state_file=args.state, db_path=args.db,
        minimum_interevent_time=args.min_interevent_time,
        threshold_window_dur=args.threshold_window,
        min_channels=args.min_channels, min_stations=args.min_stations,
        max_kurto=args.max_kurto,
    )
    n = sum(len(v) for day in results.values() for v in day.values())
    print(f"{n} new detections over {len(results)} days"
          + (f" -> {args.db}" if args.db else ""))
    return 0


def cmd_catalog(args) -> int:
    from .data import Catalog
    from .workflow import assemble_catalog

    network = _load_network(args.network)
    tg = _load_templates(args.templates, network)
    detections = {}
    for tp in tg.templates:
        fn = f"detections_tp{tp.tid}.h5"
        if not os.path.isfile(os.path.join(args.db, fn)):
            continue
        _, events = Catalog.read_from_detection_file(
            fn, db_path=args.db, return_events=True,
            extra_attributes=("cc", "n_dev", "tid"),
        )
        detections[tp.tid] = events
    catalog = assemble_catalog(
        detections, tg,
        dt_criterion=args.dt_criterion,
        distance_criterion=args.distance_criterion,
        similarity_criterion=args.similarity_criterion,
    )
    df = catalog.catalog
    if args.unique_only and "unique_event" in df.columns:
        df = df[df["unique_event"]]
    df.to_csv(args.output, index=False)
    print(f"{len(df)} events -> {args.output}")
    return 0


def cmd_bench(args) -> int:
    bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    if not os.path.isfile(bench):
        print("bench.py not found next to the package", file=sys.stderr)
        return 1
    with open(bench) as f:
        code = f.read()
    exec(compile(code, bench, "exec"), {"__name__": "__main__"})
    return 0


# ---------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="seismic_bpmf_tpu",
        description="TPU-native backprojection & matched-filtering.",
    )
    sub = p.add_subparsers(dest="command", required=True)

    sub.add_parser("info", help="device/backend/library report")

    bp = sub.add_parser("backproject", help="one-day beamforming scan")
    bp.add_argument("--config", help="reference-style key=value parameter file")
    bp.add_argument("--data", required=True, help="native HDF5 continuous data")
    bp.add_argument("--network", required=True, help="reference TSV network file")
    bp.add_argument("--travel-times", required=True, help="travel-time HDF5")
    bp.add_argument("--phases", nargs="+", default=["P", "S"])
    bp.add_argument("--engine", default="auto",
                    choices=["auto", "pallas", "onehot", "gather"])
    bp.add_argument("--precision", default="high",
                    choices=["highest", "high", "default"],
                    help="'highest' = 6-pass f32 parity; 'high' = bf16-split "
                         "ladder (~2x, oracle-gate parity); 'default' = "
                         "single bf16 pass (~3x, ~2e-2)")
    bp.add_argument("--picker-checkpoint",
                    help="PhaseNet checkpoint dir (orbax); default: envelopes")
    bp.add_argument("--min-interevent-time", type=float, default=10.0)
    bp.add_argument("--threshold-window", type=float, default=3600.0,
                    help="detection-threshold window (s); clamped to the day")
    bp.add_argument("--output", help="HDF5 file for detected events")

    mf = sub.add_parser("matched-filter", help="one-day template scan")
    mf.add_argument("--config")
    mf.add_argument("--data", required=True)
    mf.add_argument("--network", required=True)
    mf.add_argument("--templates", nargs="+", required=True,
                    help="template HDF5 files (globs ok)")
    mf.add_argument("--min-interevent-time", type=float, default=5.0)
    mf.add_argument("--threshold-window", type=float, default=1800.0,
                    help="CC-threshold window (s); clamped to the day")
    mf.add_argument("--min-channels", type=int, default=6)
    mf.add_argument("--min-stations", type=int, default=3)
    mf.add_argument("--max-kurto", type=float, default=100.0,
                    help="CC-kurtosis sanity threshold (reference default)")
    mf.add_argument("--precision", default="high",
                    choices=["highest", "high", "default"],
                    help="'highest' = 6-pass f32 parity; 'high' = bf16-split "
                         "ladder (~2x, oracle-gate parity); 'default' = "
                         "single bf16 pass (fastest, ~2e-4)")
    mf.add_argument("--db", help="output directory for per-template detections")

    sc = sub.add_parser("scan", help="multi-day campaign (checkpoint/resume)")
    sc.add_argument("--config")
    sc.add_argument("--data", nargs="+", required=True,
                    help="one native HDF5 file per day (globs ok)")
    sc.add_argument("--network", required=True)
    sc.add_argument("--templates", nargs="+", required=True)
    sc.add_argument("--state", help="JSON state file for resume")
    sc.add_argument("--min-interevent-time", type=float, default=5.0)
    sc.add_argument("--threshold-window", type=float, default=1800.0)
    sc.add_argument("--min-channels", type=int, default=6)
    sc.add_argument("--min-stations", type=int, default=3)
    sc.add_argument("--max-kurto", type=float, default=100.0)
    sc.add_argument("--db", help="output directory for per-template detections")

    ct = sub.add_parser("catalog", help="merge detection DBs into a catalog CSV")
    ct.add_argument("--network", required=True)
    ct.add_argument("--templates", nargs="+", required=True)
    ct.add_argument("--db", required=True, help="detections directory")
    ct.add_argument("--output", default="catalog.csv")
    ct.add_argument("--dt-criterion", type=float, default=3.0)
    ct.add_argument("--distance-criterion", type=float, default=5.0)
    ct.add_argument("--similarity-criterion", type=float, default=0.33)
    ct.add_argument("--unique-only", action="store_true")

    sub.add_parser("bench", help="run the repo benchmark")
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    return {
        "info": cmd_info,
        "backproject": cmd_backproject,
        "matched-filter": cmd_matched_filter,
        "scan": cmd_scan,
        "catalog": cmd_catalog,
        "bench": cmd_bench,
    }[args.command](args)


if __name__ == "__main__":
    raise SystemExit(main())
