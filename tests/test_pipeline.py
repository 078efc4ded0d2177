"""End-to-end miniature pipeline test (the tutorial-shaped slice of
SURVEY.md section 7): synthetic day -> envelope features -> beamform ->
threshold -> detections -> template extraction -> matched filter ->
threshold -> detection list.

Events are injected at known times/sources; the test asserts both engines
recover them.
"""

import numpy as np
import pandas as pd
import pytest

from seismic_bpmf_tpu.config import Config
from seismic_bpmf_tpu.data import (
    Data,
    Network,
    Template,
    TemplateGroup,
    TravelTimes,
    data_reader_hdf5,
    write_hdf5_continuous,
)
from seismic_bpmf_tpu.data.stream import Stream, Trace
from seismic_bpmf_tpu.detection import Beamformer, MatchedFilter
from seismic_bpmf_tpu.ops import saturated_envelopes


SR = 25.0
DAY = 1200.0  # a "mini day" of 20 minutes
N_STA = 6
N_SRC = 16
EVENT_TIMES = [300.0, 700.0]  # seconds into the day
EVENT_SRC = 5


@pytest.fixture(scope="module")
def mini_world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mini")
    rng = np.random.default_rng(7)
    cfg = Config(data_buffer_sec=0.0, sampling_rate_hz=SR,
                 template_len_sec=8.0, n_dev_bp_threshold=10.0,
                 n_dev_mf_threshold=8.0, matched_filter_step_samp=1)

    # network
    md = pd.DataFrame({
        "stations": [f"ST{i}" for i in range(N_STA)],
        "networks": ["XX"] * N_STA,
        "latitude": 40.0 + 0.1 * rng.random(N_STA),
        "longitude": 30.0 + 0.1 * rng.random(N_STA),
        "elevation_m": np.zeros(N_STA),
    })
    net = Network.from_dataframe(md)

    # travel-time table: random but fixed moveouts (sec), P < S
    tt_p = {f"ST{i}": rng.uniform(1.0, 6.0, N_SRC).astype(np.float32)
            for i in range(N_STA)}
    tt_s = {f"ST{i}": (tt_p[f"ST{i}"] * 1.7).astype(np.float32)
            for i in range(N_STA)}
    coords = {
        "longitude": np.linspace(30.0, 30.1, N_SRC),
        "latitude": np.linspace(40.0, 40.1, N_SRC),
        "depth": np.full(N_SRC, 8.0),
    }
    tts_path = str(tmp / "tts.h5")
    TravelTimes.write_table(tts_path, {"P": tt_p, "S": tt_s}, coords)

    # synthetic waveforms: noise + wavelets at the arrival times of src 5
    n_samp = int(DAY * SR)
    t0_epoch = 1343260800.0
    st = Stream()
    wavelet = np.sin(2 * np.pi * 5.0 * np.arange(0, 1.0, 1 / SR)) * np.hanning(int(SR))
    for i in range(N_STA):
        sta = f"ST{i}"
        for comp in "NEZ":
            x = 0.05 * rng.normal(size=n_samp).astype(np.float32)
            for ev_t in EVENT_TIMES:
                tt = tt_p[sta][EVENT_SRC] if comp == "Z" else tt_s[sta][EVENT_SRC]
                idx = int((ev_t + tt) * SR)
                x[idx : idx + len(wavelet)] += (3.0 + rng.random()) * wavelet
            st += Trace(x, station=sta, network="XX", channel=f"HH{comp}",
                        sampling_rate=SR, starttime=t0_epoch)
    day_path = str(tmp / "day.h5")
    write_hdf5_continuous(day_path, st)

    data = Data("2012-07-26", day_path, data_reader_hdf5, duration=DAY,
                sampling_rate=SR)
    data.read_waveforms()
    return dict(tmp=tmp, cfg=cfg, net=net, data=data, tts_path=tts_path)


@pytest.fixture(scope="module")
def bp_detections(mini_world):
    w = mini_world
    tt = TravelTimes("tts.h5", str(w["tmp"])).read(
        ["P", "S"], read_coords=True
    ).convert_to_samples(SR)

    bf = Beamformer(
        data=w["data"], network=w["net"], phases=["P", "S"],
        travel_times=tt, cfg=w["cfg"],
    )
    features, availability = saturated_envelopes(
        w["data"].get_np_array(w["net"].stations)
    )
    features = np.asarray(features)
    w_ph = np.zeros((N_STA, 3, 2), np.float32)
    w_ph[:, 2, 0] = 1.0  # P on Z
    w_ph[:, :2, 1] = 1.0  # S on horizontals
    bf.set_weights(weights_phases=w_ph)
    bf.set_weights_sources(method="closest_stations",
                           num_closest_stations=N_STA, normalize=True)
    bf.backproject(features, reduce="max", engine="onehot")
    thr = bf.compute_detection_threshold(window_sec=200.0)
    dets, peaks, sources = bf.find_detections(thr, minimum_interevent_time=10.0)
    return bf, dets


class TestBackprojectionE2E:
    def test_detects_injected_events(self, bp_detections):
        bf, dets = bp_detections
        assert len(dets) >= 2
        det_times = sorted(
            d.origin_time_epoch - bf.data.date_epoch for d in dets
        )
        # the two injected events must be among the detections (+- 2 s;
        # origin-time correction by moveout_to_tt shifts relative to first
        # arrival)
        for ev_t in EVENT_TIMES:
            assert any(abs(dt - ev_t) < 5.0 for dt in det_times), (
                f"event at {ev_t}s not detected: {det_times}"
            )

    def test_detection_metadata(self, bp_detections):
        bf, dets = bp_detections
        for d in dets:
            assert d.latitude is not None
            assert "maxbeam" in d.aux_data
            assert len(d.stations) == N_STA


@pytest.fixture(scope="module")
def template_group(mini_world, bp_detections):
    w = mini_world
    bf, dets = bp_detections
    # build templates from the strongest detection
    best = max(dets, key=lambda d: d.aux_data["maxbeam"])
    best.read_waveforms(
        8.0,
        offset_phase={"P": 1.0, "S": 2.0},
        time_shifted=True,
        data_reader=data_reader_hdf5,
    )
    tp = Template.init_from_event(best)
    tp.set_aux_data({"tid": 0})
    tp.id = "0"
    return TemplateGroup([tp], w["net"])


class TestMatchedFilterE2E:
    def test_detects_both_occurrences(self, mini_world, template_group):
        w = mini_world
        mf = MatchedFilter(
            template_group, min_channels=3, min_stations=2,
            max_kurto=1e6, cfg=w["cfg"],
        )
        mf.set_data(w["data"])
        mf.set_weights_channels(method="simple", normalize=True)
        white_noise = np.random.default_rng(0).normal(size=500).astype(
            np.float32
        )
        mf.compute_cc_time_series(n_corr_block=8192)
        dets = mf.find_detections(
            minimum_interevent_time=5.0,
            threshold_window_dur=200.0,
            white_noise=white_noise,
        )
        assert "0" in dets or 0 in dets
        key = "0" if "0" in dets else 0
        det_times = sorted(
            d.origin_time_epoch - w["data"].date_epoch for d in dets[key]
        )
        assert len(det_times) >= 2
        # both injected occurrences detected (the template itself + repeat)
        cc_vals = [d.aux_data["cc"] for d in dets[key]]
        assert max(cc_vals) > 0.9  # self-detection

    def test_plan_cache_lru_across_weight_churn(self, mini_world,
                                                template_group):
        """Availability churn: a weight change must rebuild the filter
        plans (new content CRC), and returning to a previous weight
        epoch must reuse the cached plan set (true LRU — the hit also
        refreshes recency so alternating epochs don't thrash eviction).
        Reference behavior being replaced: per-day weight refresh,
        BPMF/similarity_search.py:423-474."""
        w = mini_world
        mf = MatchedFilter(
            template_group, min_channels=3, min_stations=2,
            max_kurto=1e6, cfg=w["cfg"], engine="pallas",
        )
        mf.set_data(w["data"])
        mf.set_weights_channels(method="simple", normalize=True)
        mf.compute_cc_time_series(n_corr_block=8192)
        plans = mf._pallas_plans
        assert len(plans) == 1
        key_a, val_a = next(iter(plans.items()))
        w_a = mf.weights_channels.copy()
        # day-2 churn: station 0 drops out -> new weight CRC
        w_b = w_a.copy()
        w_b[:, 0, :] = 0.0
        w_b /= w_b.sum(axis=(1, 2), keepdims=True)
        mf.weights_channels = w_b
        mf.compute_cc_time_series(n_corr_block=8192)
        assert len(mf._pallas_plans) == 2
        # day 3 returns to epoch A: plan set reused (identity), recency
        # refreshed to most-recent-inserted
        mf.weights_channels = w_a
        mf.compute_cc_time_series(n_corr_block=8192)
        plans = mf._pallas_plans
        assert len(plans) == 2
        assert plans[key_a][0] is val_a[0]
        assert list(plans)[-1] == key_a

    def test_tiny_max_memory_warns(self, mini_world, template_group,
                                   caplog):
        """max_memory_gb too small for 2 CC rows silently disables the
        batched extraction pipeline (per-template dispatch is ~20x
        slower through a tunneled link) — the engine must warn."""
        import logging

        w = mini_world
        mf = MatchedFilter(
            template_group, min_channels=3, min_stations=2,
            max_kurto=1e6, cfg=w["cfg"], max_memory_gb=1e-6,
        )
        mf.set_data(w["data"])
        with caplog.at_level(logging.WARNING,
                             logger="seismic_bpmf_tpu"):
            assert mf._extraction_chunk(128) == 1
        assert any("max_memory_gb" in r.message for r in caplog.records)


class TestBeamRelocation:
    def test_relocate_beam_moves_to_true_source(self, mini_world,
                                                bp_detections):
        w = mini_world
        bf, dets = bp_detections
        ev = max(dets, key=lambda d: d.aux_data["maxbeam"])
        # fine-grid relocation on the same grid, full beam
        env, _ = __import__("seismic_bpmf_tpu.ops", fromlist=["x"]).saturated_envelopes(
            w["data"].get_np_array(w["net"].stations)
        )
        import numpy as np

        true_lon = bf.source_coordinates["longitude"].iloc[EVENT_SRC]
        true_lat = bf.source_coordinates["latitude"].iloc[EVENT_SRC]
        ev2 = ev.relocate(bf, np.asarray(env), routine="beam")
        assert abs(ev2.longitude - true_lon) < 0.05
        assert abs(ev2.latitude - true_lat) < 0.05
        assert "hmax_unc" in ev2.aux_data
        # arrival-time table filled from the relocated source's moveouts
        assert "P_tt_sec" in ev2.arrival_times.columns
        assert "S_abs_arrival_times" in ev2.arrival_times.columns
        assert len(ev2.arrival_times) == len(bf.network.stations)

    def test_temporal_method_matches_spatial_location(self, mini_world,
                                                      bp_detections):
        """The temporal (Gibbs, max-reduced) path — the O(n_src)-memory
        route for million-source grids — finds the same hypocenter as the
        full spatial beam."""
        w = mini_world
        bf, dets = bp_detections
        ev = max(dets, key=lambda d: d.aux_data["maxbeam"])
        env, _ = saturated_envelopes(
            w["data"].get_np_array(w["net"].stations)
        )
        ev_sp = ev.relocate(bf, np.asarray(env), routine="beam",
                            uncertainty_method="spatial")
        loc_sp = (ev_sp.longitude, ev_sp.latitude, ev_sp.depth)
        ev_tmp = ev.relocate(bf, np.asarray(env), routine="beam",
                             uncertainty_method="temporal")
        assert (ev_tmp.longitude, ev_tmp.latitude, ev_tmp.depth) == loc_sp
        assert np.isfinite(ev_tmp.aux_data["hmax_unc"])
        assert np.isfinite(ev_tmp.aux_data["vmax_unc"])

    def test_relocate_reads_own_waveforms_and_updates_origin_time(
            self, mini_world, bp_detections):
        """waveform_features=None: the event reads its own window
        (picking mode), envelopes it, and the origin time moves to the
        beam argmax inside that window."""
        w = mini_world
        bf, dets = bp_detections
        ev = max(dets, key=lambda d: d.aux_data["maxbeam"])
        ot_before = ev.origin_time_epoch
        ev2 = ev.relocate(
            bf, routine="beam", duration=40.0, offset_ot=10.0,
            data_reader=data_reader_hdf5,
        )
        true_lon = bf.source_coordinates["longitude"].iloc[EVENT_SRC]
        true_lat = bf.source_coordinates["latitude"].iloc[EVENT_SRC]
        assert abs(ev2.longitude - true_lon) < 0.05
        assert abs(ev2.latitude - true_lat) < 0.05
        # origin time moved to the beam argmax with the same
        # moveout_to_tt correction find_detections applies — the
        # relocated time must agree with the detection's convention
        # (same event, same grid) to within a few samples of jitter
        assert abs(ev2.origin_time_epoch - ot_before) < 2.0
        # arrival-time table holds ABSOLUTE travel times: every arrival
        # is at least the minimum P travel time after the origin
        assert (ev2.arrival_times["P_tt_sec"].values > 0.5).all()

    def test_rectangular_domain_mask(self, bp_detections):
        bf, _ = bp_detections
        src = bf.source_coordinates
        lon0 = float(src["longitude"].iloc[EVENT_SRC])
        lat0 = float(src["latitude"].iloc[EVENT_SRC])
        mask = bf._rectangular_domain(lon0, lat0, side_km=3.0)
        assert mask.dtype == bool and mask.shape == (N_SRC,)
        assert mask[EVENT_SRC]  # the center source is inside
        # a huge box contains everything; a tiny one only the center
        assert bf._rectangular_domain(lon0, lat0, side_km=1e4).all()
        tiny = bf._rectangular_domain(lon0, lat0, side_km=1e-3)
        assert tiny.sum() <= 1

    def test_beamformer_plot_detection_delegate(self, mini_world,
                                                bp_detections):
        """Beamformer.plot_detection reads the detection's waveforms in
        picking mode and renders the gallery over the max beam."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        w = mini_world
        bf, dets = bp_detections
        import copy

        ev = copy.deepcopy(max(dets, key=lambda d: d.aux_data["maxbeam"]))
        fig = bf.plot_detection(ev, duration=20.0,
                                data_reader=data_reader_hdf5,
                                figsize=(8, 8))
        # one row per station + the context row
        assert len(fig.axes) >= N_STA * 3 + 1
        plt.close(fig)

    def test_set_source_coordinates_override(self, bp_detections):
        import pandas as pd

        bf, _ = bp_detections
        orig = bf.source_coordinates
        try:
            override = pd.DataFrame({
                "longitude": np.zeros(N_SRC),
                "latitude": np.zeros(N_SRC),
                "depth": np.zeros(N_SRC),
            })
            bf.set_source_coordinates(override)
            assert (bf.source_coordinates["longitude"] == 0.0).all()
        finally:
            del bf._source_coordinates
        assert bf.source_coordinates is orig or (
            bf.source_coordinates["longitude"].equals(orig["longitude"])
        )


class TestExtractionChunkBound:
    """`_extraction_chunk`: a user `max_memory_gb` keeps the reference
    semantics (GB / per-row CC size, BPMF/similarity_search.py:726-807);
    unset on an accelerator it auto-bounds so the batched extraction's
    ~3 HLO-temp copies of the CC stack fit in HBM (a 1024-template
    25 Hz day OOMed a 16 GB chip unchunked)."""

    def _mf(self, **kw):
        from types import SimpleNamespace

        mf = MatchedFilter(SimpleNamespace(n_templates=1024), **kw)
        # a full 25 Hz day at step 1: 2.16 M samples x 4 B per CC row
        mf.data = SimpleNamespace(duration=86400.0, sr=25.0)
        return mf

    def test_user_bound_keeps_reference_semantics(self):
        mf = self._mf(max_memory_gb=1.0, engine="pallas")
        assert mf._extraction_chunk(1024) == int(
            1.0 / mf.memory_cc_time_series_gb
        )

    def test_host_path_unbounded(self):
        assert self._mf(engine="xla")._extraction_chunk(1024) == 1024

    def test_device_auto_bound_fits_hbm(self, monkeypatch):
        mf = self._mf(engine="pallas")
        monkeypatch.setattr(
            MatchedFilter, "_device_memory_gb",
            staticmethod(lambda: 16.0),
        )
        n = mf._extraction_chunk(1024)
        row = mf.memory_cc_time_series_gb
        assert 1 <= n < 1024
        # stack + temps (~4x the stack) stay inside a quarter of HBM;
        # one more template per chunk would cross the budget
        assert 4.0 * n * row <= 16.0 / 4.0 < 4.0 * (n + 1) * row

    def test_device_memory_probe_positive(self):
        assert MatchedFilter._device_memory_gb() > 0


class TestDeviceDetectionPath:
    def test_pallas_engine_matches_host_path(self, mini_world,
                                             template_group):
        """The device-resident detection path (Pallas CC + on-device
        threshold/top-k extraction) must yield the same detections as the
        host path."""
        w = mini_world
        white_noise = np.random.default_rng(0).normal(size=500).astype(
            np.float32
        )

        def run(engine):
            mf = MatchedFilter(
                template_group, min_channels=3, min_stations=2,
                max_kurto=1e6, cfg=w["cfg"], engine=engine,
            )
            mf.set_data(w["data"])
            mf.set_weights_channels(method="simple", normalize=True)
            mf.compute_cc_time_series(n_corr_block=8192)
            dets = mf.find_detections(
                minimum_interevent_time=5.0, threshold_window_dur=200.0,
                white_noise=white_noise,
            )
            key = list(dets.keys())[0]
            return sorted(
                (d.origin_time_epoch, round(d.aux_data["cc"], 4))
                for d in dets[key]
            )

        host = run("xla")
        device = run("pallas")
        assert len(device) == len(host) and len(device) >= 2
        for (t1, c1), (t2, c2) in zip(host, device):
            assert abs(t1 - t2) < 1e-6
            assert abs(c1 - c2) < 2e-3

    def test_pipelined_chunked_scan_matches_host(self, mini_world,
                                                 template_group):
        """`run_matched_filter_search` on the device path dispatches every
        chunk's CC + extraction before fetching (overlapped pipeline) and
        drops CC buffers between chunks; detections must equal the
        sequential host path on a multi-template, multi-chunk bank."""
        w = mini_world
        tp0 = template_group.templates[0]
        tps = []
        for tid in range(4):
            tp = Template.init_from_event(tp0)
            tp.set_aux_data({"tid": tid})
            tp.id = str(tid)
            tps.append(tp)
        tg = TemplateGroup(tps, w["net"])
        white_noise = np.random.default_rng(0).normal(size=500).astype(
            np.float32
        )

        def run(engine, per_chunk=2):
            mf = MatchedFilter(
                tg, min_channels=3, min_stations=2, max_kurto=1e6,
                cfg=w["cfg"], engine=engine,
            )
            mf.set_data(w["data"])
            mf.set_weights_channels(method="simple", normalize=True)
            mf.max_memory_gb = (
                per_chunk + 0.01
            ) * mf.memory_cc_time_series_gb
            dets = mf.run_matched_filter_search(
                minimum_interevent_time=5.0, threshold_window_dur=200.0,
                verbose=-1, white_noise=white_noise,
            )
            return {
                tid: sorted(
                    (d.origin_time_epoch, round(d.aux_data["cc"], 4))
                    for d in evs
                )
                for tid, evs in dets.items()
            }

        host = run("xla")
        device = run("pallas")
        # ragged chunking: last chunk holds a single template (exercises
        # the no-batch-program context path)
        device_ragged = run("pallas", per_chunk=3)
        for got in (device, device_ragged):
            assert set(host) == set(got) and len(host) == 4
            for tid in host:
                assert len(host[tid]) == len(got[tid]) >= 2
                for (t1, c1), (t2, c2) in zip(host[tid], got[tid]):
                    assert abs(t1 - t2) < 1e-6
                    assert abs(c1 - c2) < 2e-3

    def test_pipelined_mad_threshold_no_white_noise(self, mini_world,
                                                    template_group):
        """threshold_type='mad' on the pipelined device path with NO
        explicit white_noise (the production scan_days path): the
        noise-fill sizing must come from the chunk's stacked CC, since
        deferred-row dispatch never writes per-tid rows."""
        w = mini_world
        tp0 = template_group.templates[0]
        tps = []
        for tid in range(4):
            tp = Template.init_from_event(tp0)
            tp.set_aux_data({"tid": tid})
            tp.id = str(tid)
            tps.append(tp)
        tg = TemplateGroup(tps, w["net"])
        mf = MatchedFilter(
            tg, min_channels=3, min_stations=2, max_kurto=1e6,
            cfg=w["cfg"], engine="pallas", threshold_type="mad",
        )
        mf.set_data(w["data"])
        mf.set_weights_channels(method="simple", normalize=True)
        mf.max_memory_gb = 2.01 * mf.memory_cc_time_series_gb
        dets = mf.run_matched_filter_search(
            minimum_interevent_time=5.0, threshold_window_dur=200.0,
            verbose=-1,
        )
        assert {str(t) for t in dets} == {"0", "1", "2", "3"}
        assert all(len(evs) >= 2 for evs in dets.values())
