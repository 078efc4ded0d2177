"""CLI end-to-end: info, backproject, matched-filter, scan, catalog on the
synthetic mini-dataset, via `seismic_bpmf_tpu.cli.main` (no subprocess so
the conftest's virtual-CPU-mesh JAX config stays in effect)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from seismic_bpmf_tpu.cli import main
from seismic_bpmf_tpu.config import Config
from seismic_bpmf_tpu.data import Network, TravelTimes, write_hdf5_continuous
from seismic_bpmf_tpu.data.stream import Stream, Trace

SR = 25.0
DAY = 900.0
N_STA = 5
N_SRC = 9
EVENT_TIMES = [200.0, 600.0]
EVENT_SRC = 3


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(11)
    cfg = Config(data_buffer_sec=0.0, sampling_rate_hz=SR,
                 template_len_sec=8.0, n_dev_bp_threshold=10.0,
                 n_dev_mf_threshold=8.0)
    cfg.to_file(str(tmp / "params.cfg"))
    md = pd.DataFrame({
        "stations": [f"S{i}" for i in range(N_STA)],
        "networks": ["XX"] * N_STA,
        "latitude": 40.0 + 0.05 * np.arange(N_STA),
        "longitude": 30.0 + 0.05 * np.arange(N_STA),
        "elevation_m": np.zeros(N_STA),
    })
    net = Network.from_dataframe(md)
    net.start_date = np.datetime64("2012-07-26")
    net.end_date = np.datetime64("2012-07-27")
    net.write(str(tmp / "network.tsv"))
    tt_p = {f"S{i}": rng.uniform(1.0, 5.0, N_SRC).astype(np.float32)
            for i in range(N_STA)}
    tt_s = {k: (v * 1.7).astype(np.float32) for k, v in tt_p.items()}
    TravelTimes.write_table(
        str(tmp / "tts.h5"), {"P": tt_p, "S": tt_s},
        {"longitude": np.linspace(30, 30.2, N_SRC),
         "latitude": np.linspace(40, 40.2, N_SRC),
         "depth": np.full(N_SRC, 8.0)},
    )
    n = int(DAY * SR)
    n_w = int(1.5 * SR)
    wavelet = (np.sin(2 * np.pi * 4.0 * np.arange(n_w) / SR)
               * np.hanning(n_w))
    st = Stream()
    for i in range(N_STA):
        sta = f"S{i}"
        for comp in "NEZ":
            x = 0.05 * rng.normal(size=n).astype(np.float32)
            for ev_t in EVENT_TIMES:
                tt = (tt_p[sta][EVENT_SRC] if comp == "Z"
                      else tt_s[sta][EVENT_SRC])
                k = int((ev_t + tt) * SR)
                x[k : k + len(wavelet)] += 4.0 * wavelet
            st += Trace(x, station=sta, network="XX", channel=f"HH{comp}",
                        sampling_rate=SR, starttime=1343260800.0)
    write_hdf5_continuous(str(tmp / "day.h5"), st)
    return tmp


def test_info(capsys):
    assert main(["info"]) == 0
    report = json.loads(capsys.readouterr().out)
    assert "backend" in report and "devices" in report


def test_pipeline_via_cli(world, capsys):
    tmp = world
    # 1. backproject -> events file
    rc = main([
        "backproject",
        "--config", str(tmp / "params.cfg"),
        "--data", str(tmp / "day.h5"),
        "--network", str(tmp / "network.tsv"),
        "--travel-times", str(tmp / "tts.h5"),
        "--min-interevent-time", "10",
        "--output", str(tmp / "bp_events.h5"),
    ])
    assert rc == 0
    assert os.path.isfile(tmp / "bp_events.h5")

    # 2. build templates programmatically from the BP events (the template
    # builder needs the picker-or-offset policy, kept out of the CLI), then
    # run the CLI matched filter over the same day.
    from seismic_bpmf_tpu.data import Catalog, data_reader_hdf5
    from seismic_bpmf_tpu.workflow import build_templates

    _, events = Catalog.read_from_detection_file(
        "bp_events.h5", db_path=str(tmp), return_events=True,
        extra_attributes=(),
    )
    assert len(events) >= 2
    cfg = Config.from_file(str(tmp / "params.cfg"))
    net = Network("network.tsv", str(tmp)).read()
    tg = build_templates(events, net, cfg=cfg,
                         data_reader=data_reader_hdf5,
                         db_path=str(tmp / "templates"))
    assert tg.n_templates >= 1

    rc = main([
        "matched-filter",
        "--config", str(tmp / "params.cfg"),
        "--data", str(tmp / "day.h5"),
        "--network", str(tmp / "network.tsv"),
        "--templates", str(tmp / "templates" / "template*.h5"),
        "--db", str(tmp / "detections"),
        "--min-channels", "3", "--min-stations", "2", "--max-kurto", "1e6",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    n_det = int(out.split()[0])
    assert n_det >= 2

    # 3. catalog
    rc = main([
        "catalog",
        "--network", str(tmp / "network.tsv"),
        "--templates", str(tmp / "templates" / "template*.h5"),
        "--db", str(tmp / "detections"),
        "--output", str(tmp / "catalog.csv"),
    ])
    assert rc == 0
    df = pd.read_csv(tmp / "catalog.csv")
    assert len(df) >= 2
    assert "unique_event" in df.columns

    # 4. multi-day scan with resume state
    rc = main([
        "scan",
        "--config", str(tmp / "params.cfg"),
        "--data", str(tmp / "day.h5"),
        "--network", str(tmp / "network.tsv"),
        "--templates", str(tmp / "templates" / "template*.h5"),
        "--state", str(tmp / "state.json"),
        "--db", str(tmp / "scan_detections"),
        "--min-channels", "3", "--min-stations", "2", "--max-kurto", "1e6",
    ])
    assert rc == 0
    state = json.loads((tmp / "state.json").read_text())
    assert len(state) == 1
    # resume: second run does nothing
    rc = main([
        "scan",
        "--config", str(tmp / "params.cfg"),
        "--data", str(tmp / "day.h5"),
        "--network", str(tmp / "network.tsv"),
        "--templates", str(tmp / "templates" / "template*.h5"),
        "--state", str(tmp / "state.json"),
        "--db", str(tmp / "scan_detections"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "0 new detections over 0 days" in out.splitlines()[-1]
