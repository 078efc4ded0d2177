"""Workflow-level test: the full staged pipeline API on the synthetic
mini-dataset (backproject -> templates -> matched filter -> catalog)."""

import numpy as np
import pandas as pd
import pytest

from seismic_bpmf_tpu import workflow
from seismic_bpmf_tpu.config import Config
from seismic_bpmf_tpu.data import (
    Data,
    Network,
    TravelTimes,
    data_reader_hdf5,
    write_hdf5_continuous,
)
from seismic_bpmf_tpu.data.stream import Stream, Trace

SR = 25.0
DAY = 900.0
N_STA = 5
N_SRC = 9
EVENT_TIMES = [200.0, 600.0]
EVENT_SRC = 3


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wf")
    rng = np.random.default_rng(11)
    cfg = Config(data_buffer_sec=0.0, sampling_rate_hz=SR,
                 template_len_sec=8.0, n_dev_bp_threshold=10.0,
                 n_dev_mf_threshold=8.0)
    md = pd.DataFrame({
        "stations": [f"S{i}" for i in range(N_STA)],
        "networks": ["XX"] * N_STA,
        "latitude": 40.0 + 0.05 * np.arange(N_STA),
        "longitude": 30.0 + 0.05 * np.arange(N_STA),
        "elevation_m": np.zeros(N_STA),
    })
    net = Network.from_dataframe(md)
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
                tt = tt_p[sta][EVENT_SRC] if comp == "Z" else tt_s[sta][EVENT_SRC]
                k = int((ev_t + tt) * SR)
                x[k : k + len(wavelet)] += 4.0 * wavelet
            st += Trace(x, station=sta, network="XX", channel=f"HH{comp}",
                        sampling_rate=SR, starttime=1343260800.0)
    write_hdf5_continuous(str(tmp / "day.h5"), st)
    data = Data("2012-07-26", str(tmp / "day.h5"), data_reader_hdf5,
                duration=DAY, sampling_rate=SR).read_waveforms()
    tts = TravelTimes("tts.h5", str(tmp)).read(
        ["P", "S"], read_coords=True).convert_to_samples(SR)
    return dict(cfg=cfg, net=net, data=data, tts=tts)


def test_full_workflow(world):
    w = world
    bf, detections = workflow.backproject_day(
        w["data"], w["net"], w["tts"], cfg=w["cfg"],
        minimum_interevent_time=10.0, threshold_window_sec=150.0,
        num_closest_stations=N_STA,
    )
    assert len(detections) >= 2

    tg = workflow.build_templates(
        detections, w["net"], cfg=w["cfg"], data_reader=data_reader_hdf5,
        dedup_similarity=0.95,
    )
    assert tg.n_templates >= 1

    dets = workflow.matched_filter_day(
        tg, w["data"], cfg=w["cfg"], minimum_interevent_time=5.0,
        threshold_window_dur=150.0, min_channels=3, min_stations=2,
        max_kurto=1e6,
    )
    n_total = sum(len(v) for v in dets.values())
    assert n_total >= 2  # both injected occurrences found

    cat = workflow.assemble_catalog(dets, tg)
    assert cat.n_events == n_total
    assert "unique_event" in cat.catalog.columns
    uniq = cat.catalog[cat.catalog["unique_event"]]
    # the two physical events remain after dedup
    assert len(uniq) >= 2
    from seismic_bpmf_tpu.utils.observe import GLOBAL_TIMER

    rep = GLOBAL_TIMER.report()
    assert "bp_backproject" in rep["stages"]


def test_backproject_day_truncates_stale_groups(world, tmp_path):
    """A rerun day's output file holds exactly that run's detections —
    higher-numbered groups from a previous partial run must not survive
    (resume reruns whole days, so append mode would leave stale events)."""
    import h5py

    w = world
    out = str(tmp_path / "raw_bp_test.h5")
    with h5py.File(out, "w") as f:
        for g in ("0", "1", "2", "97", "98", "99"):
            f.create_group(g).create_dataset("stale", data=[1])
    bf, detections = workflow.backproject_day(
        w["data"], w["net"], w["tts"], cfg=w["cfg"],
        minimum_interevent_time=10.0, threshold_window_sec=150.0,
        num_closest_stations=N_STA, output_file=out,
    )
    with h5py.File(out, "r") as f:
        groups = set(f.keys())
    assert groups == {str(i) for i in range(len(detections))}
    assert "99" not in groups


def test_scan_days_resume(world, tmp_path):
    """Two-'day' campaign with checkpoint/resume."""
    w = world
    bf, detections = workflow.backproject_day(
        w["data"], w["net"], w["tts"], cfg=w["cfg"],
        minimum_interevent_time=10.0, threshold_window_sec=150.0,
        num_closest_stations=N_STA,
    )
    tg = workflow.build_templates(
        detections, w["net"], cfg=w["cfg"], data_reader=data_reader_hdf5,
    )
    state = str(tmp_path / "campaign.json")
    calls = []

    def make_data(date):
        calls.append(date)
        return w["data"]

    r1 = workflow.scan_days(
        ["d1", "d2"], make_data, tg, cfg=w["cfg"], state_file=state,
        minimum_interevent_time=5.0, threshold_window_dur=150.0,
        min_channels=3, min_stations=2, max_kurto=1e6,
    )
    assert set(r1.keys()) == {"d1", "d2"} and len(calls) == 2
    # resume: nothing re-run
    r2 = workflow.scan_days(
        ["d1", "d2"], make_data, tg, cfg=w["cfg"], state_file=state,
        minimum_interevent_time=5.0, threshold_window_dur=150.0,
        min_channels=3, min_stations=2, max_kurto=1e6,
    )
    assert r2 == {} and len(calls) == 2


def test_scan_days_bp_campaign(world, tmp_path):
    """BP campaign through scan_days: per-day detections + raw_bp_<date>
    files + the same resume state, with ONE campaign-persistent
    Beamformer (its plans upload once)."""
    import os

    w = world
    state = str(tmp_path / "bp_campaign.json")
    db = str(tmp_path / "bp_db")
    calls = []
    engines = []

    orig = workflow.backproject_day

    def spy(*a, **k):
        out = orig(*a, **k)
        engines.append(id(out[0]))
        return out

    workflow.backproject_day, restore = spy, orig
    try:
        r1 = workflow.scan_days(
            ["d1", "d2"], lambda d: (calls.append(d) or w["data"]),
            cfg=w["cfg"], state_file=state, db_path=db, stage="bp",
            network=w["net"], travel_times=w["tts"],
            minimum_interevent_time=10.0, threshold_window_sec=150.0,
            num_closest_stations=N_STA,
        )
    finally:
        workflow.backproject_day = restore
    assert set(r1.keys()) == {"d1", "d2"} and len(calls) == 2
    # the two injected events are found every day
    for key in ("d1", "d2"):
        assert len(r1[key]) >= 2
        assert all(hasattr(ev, "aux_data") for ev in r1[key])
    # the SAME Beamformer instance served both days
    assert len(set(engines)) == 1
    assert os.path.isfile(os.path.join(db, "raw_bp_d1.h5"))
    assert os.path.isfile(os.path.join(db, "raw_bp_d2.h5"))
    # resume: nothing re-run
    r2 = workflow.scan_days(
        ["d1", "d2"], lambda d: (calls.append(d) or w["data"]),
        cfg=w["cfg"], state_file=state, db_path=db, stage="bp",
        network=w["net"], travel_times=w["tts"],
        minimum_interevent_time=10.0, threshold_window_sec=150.0,
        num_closest_stations=N_STA,
    )
    assert r2 == {} and len(calls) == 2
    # stage validation
    with pytest.raises(ValueError, match="stage='bp' requires"):
        workflow.scan_days(["d1"], lambda d: w["data"], stage="bp")
    with pytest.raises(ValueError, match="template_group"):
        workflow.scan_days(["d1"], lambda d: w["data"], stage="mf")


def test_backproject_with_phasenet_features(world):
    """The picker-probability feature path (2 feature channels) flows
    through backproject_day end to end (untrained net: no detection count
    asserted)."""
    w = world
    feature_fn = workflow.phasenet_feature_fn()
    bf, detections = workflow.backproject_day(
        w["data"], w["net"], w["tts"], cfg=w["cfg"],
        feature_fn=feature_fn,
        minimum_interevent_time=10.0, threshold_window_sec=150.0,
        num_closest_stations=N_STA,
    )
    assert bf.maxbeam.shape[-1] == w["data"].n_samples
    assert isinstance(detections, list)


def test_sharded_day_scan_matches_unsharded(world):
    """The FULL workflow layer (backproject_day + matched_filter_day) run
    with mesh-sharded engines produces the same detection lists as the
    single-chip scan — device-resident plans, halo sharding, and the
    workflow orchestration validated together (replaces the reference's
    lock-file day parallelism, BPMF/utils.py:1883-1958)."""
    from seismic_bpmf_tpu.parallel import make_mesh

    w = world
    kw = dict(
        cfg=w["cfg"], minimum_interevent_time=10.0,
        threshold_window_sec=150.0, num_closest_stations=N_STA,
    )
    _, det_ref = workflow.backproject_day(w["data"], w["net"], w["tts"],
                                          **kw)
    bp_mesh = make_mesh({"src": 2, "time": 4})
    _, det_sh = workflow.backproject_day(w["data"], w["net"], w["tts"],
                                         mesh=bp_mesh, **kw)
    t_ref = sorted(ev.origin_time_epoch for ev in det_ref)
    t_sh = sorted(ev.origin_time_epoch for ev in det_sh)
    assert len(t_ref) == len(t_sh) >= 2
    np.testing.assert_allclose(t_sh, t_ref, atol=1.0 / SR)

    tg = workflow.build_templates(
        det_ref, w["net"], cfg=w["cfg"], data_reader=data_reader_hdf5,
        dedup_similarity=0.95,
    )
    mf_kw = dict(
        cfg=w["cfg"], minimum_interevent_time=5.0,
        threshold_window_dur=150.0, min_channels=3, min_stations=2,
        max_kurto=1e6,
    )
    dets_ref = workflow.matched_filter_day(tg, w["data"], **mf_kw)
    mf_mesh = make_mesh({"tp": 2, "time": 4})
    dets_sh = workflow.matched_filter_day(tg, w["data"], mesh=mf_mesh,
                                          **mf_kw)
    assert set(dets_ref.keys()) == set(dets_sh.keys())
    for tid in dets_ref:
        ref_evs, sh_evs = dets_ref[tid], dets_sh[tid]
        assert len(ref_evs) == len(sh_evs)
        for a, b in zip(
            sorted(ref_evs, key=lambda e: e.origin_time_epoch),
            sorted(sh_evs, key=lambda e: e.origin_time_epoch),
        ):
            assert abs(a.origin_time_epoch - b.origin_time_epoch) <= 1.0 / SR
            assert a.aux_data["cc"] == pytest.approx(
                b.aux_data["cc"], abs=1e-4
            )


def test_scan_days_reuses_template_plans(world, tmp_path, monkeypatch):
    """A campaign builds the device-resident template plans ONCE; a change
    in channel weights (e.g. availability) rebuilds them (the plan cache
    fingerprints filter content)."""
    import seismic_bpmf_tpu.ops.pallas_mf as pmf

    w = world
    bf, detections = workflow.backproject_day(
        w["data"], w["net"], w["tts"], cfg=w["cfg"],
        minimum_interevent_time=10.0, threshold_window_sec=150.0,
        num_closest_stations=N_STA,
    )
    tg = workflow.build_templates(
        detections, w["net"], cfg=w["cfg"], data_reader=data_reader_hdf5,
    )
    builds = []
    orig_init = pmf.PallasMatchedFilterPlan.__init__

    def counting_init(self, *a, **k):
        builds.append(1)
        return orig_init(self, *a, **k)

    monkeypatch.setattr(pmf.PallasMatchedFilterPlan, "__init__",
                        counting_init)
    workflow.scan_days(
        ["d1", "d2", "d3"], lambda d: w["data"], tg, cfg=w["cfg"],
        minimum_interevent_time=5.0, threshold_window_dur=150.0,
        min_channels=3, min_stations=2, max_kurto=1e6, engine="pallas",
    )
    n_first = len(builds)
    assert n_first >= 1  # day 1 built the plans
    # days 2-3 reused them
    assert len(builds) == n_first

    # engine-level: changed weights must miss the cache
    from seismic_bpmf_tpu.detection.matched_filter import MatchedFilter

    mf = MatchedFilter(tg, min_channels=3, min_stations=2, max_kurto=1e6,
                       engine="pallas")
    mf.set_data(w["data"])
    mf.set_weights_channels(method="simple", normalize=True)
    run = np.arange(tg.n_templates)
    tpl = tg.waveforms_arr.astype(np.float32)
    mv = tg.moveouts_arr
    we = mf.weights_channels.astype(np.float32)
    mf._pallas_scan(run, tpl, mv, we)
    n_after_first = len(builds)
    mf._pallas_scan(run, tpl, mv, we)
    assert len(builds) == n_after_first  # identical content: cache hit
    mf._pallas_scan(run, tpl, mv, we * 0.5)
    assert len(builds) > n_after_first  # changed weights: rebuild


def test_preupload_day_parity(world, monkeypatch):
    """`preupload_day` + `set_data` must (a) hand the engine the SAME
    normalized array and padded upload a plain `set_data` would build, and
    (b) actually be consumed — the scan must not re-pad the day."""
    from seismic_bpmf_tpu.detection.matched_filter import MatchedFilter
    import seismic_bpmf_tpu.ops.pallas_mf as pmf

    w = world
    bf, detections = workflow.backproject_day(
        w["data"], w["net"], w["tts"], cfg=w["cfg"],
        minimum_interevent_time=10.0, threshold_window_sec=150.0,
        num_closest_stations=N_STA,
    )
    tg = workflow.build_templates(
        detections, w["net"], cfg=w["cfg"], data_reader=data_reader_hdf5,
    )
    kw = dict(cfg=w["cfg"], min_channels=3, min_stations=2, max_kurto=1e6,
              engine="pallas")

    mf1 = MatchedFilter(tg, **kw)
    mf1.set_data(w["data"])
    mf1.set_weights_channels(method="simple", normalize=True)
    d1 = mf1.run_matched_filter_search(5.0, threshold_window_dur=150.0)

    mf2 = MatchedFilter(tg, **kw)
    mf2.preupload_day(w["data"])
    (bundle,) = mf2._preloaded.values()
    assert "pad" in bundle  # pallas engine: padded upload started
    np.testing.assert_allclose(bundle["arr"], mf1.data_arr, rtol=1e-6)
    mf2.set_data(w["data"])
    assert mf2._data_pad is not None and not mf2._preloaded
    np.testing.assert_allclose(mf2.data_norm, mf1.data_norm, rtol=1e-6)
    mf2.set_weights_channels(method="simple", normalize=True)

    def no_repad(self, data):  # consumed bundle => never called
        raise AssertionError("scan re-padded a preuploaded day")

    monkeypatch.setattr(pmf.PallasMatchedFilterPlan, "pad_data", no_repad)
    d2 = mf2.run_matched_filter_search(5.0, threshold_window_dur=150.0)

    assert set(d1) == set(d2)
    for tid in d1:
        assert len(d1[tid]) == len(d2[tid])
        for e1, e2 in zip(d1[tid], d2[tid]):
            assert e1.origin_time == e2.origin_time
            assert np.isclose(e1.aux_data["cc"], e2.aux_data["cc"],
                              rtol=1e-5)


def test_data_layout_matches_plan(world):
    """`PallasMatchedFilterPlan.data_layout` must predict the exact padded
    geometry of a plan built with the same overrides, and the module-level
    `pad_day_data` must equal the plan's own `pad_data`."""
    from seismic_bpmf_tpu.ops.pallas_mf import (
        PallasMatchedFilterPlan, pad_day_data,
    )

    rng = np.random.default_rng(3)
    n_tp, n_sta, n_comp, L, n_samp = 4, 3, 2, 96, 4096
    tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
    mv = rng.integers(-40, 300, size=(n_tp, n_sta, n_comp)).astype(np.int64)
    wgt = np.full((n_tp, n_sta, n_comp), 1.0 / 6, np.float32)
    pad_left = int(-min(0, mv.min()))
    max_mv = int(mv.max())
    plan = PallasMatchedFilterPlan(
        tp, mv, wgt, n_samp, interpret=True, pad_left=pad_left,
        max_moveout=max_mv,
    )
    got_pl, got_ext = PallasMatchedFilterPlan.data_layout(
        n_samp, L, pad_left, max_mv
    )
    assert (got_pl, got_ext) == (plan.pad_left, plan.ext)
    data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(plan.pad_data(data)),
        np.asarray(pad_day_data(data, n_sta * n_comp, n_samp, got_pl,
                                got_ext)),
    )


def test_screen_precision_detection_parity(world):
    """'screen' mode (single-pass bf16 scan + margin-widened extraction +
    exact per-candidate refine) must reproduce the 'highest' engine's
    detections: same events, CC values at oracle precision."""
    from seismic_bpmf_tpu.detection.matched_filter import MatchedFilter

    w = world
    bf, detections = workflow.backproject_day(
        w["data"], w["net"], w["tts"], cfg=w["cfg"],
        minimum_interevent_time=10.0, threshold_window_sec=150.0,
        num_closest_stations=N_STA,
    )
    tg = workflow.build_templates(
        detections, w["net"], cfg=w["cfg"], data_reader=data_reader_hdf5,
    )
    kw = dict(cfg=w["cfg"], min_channels=3, min_stations=2, max_kurto=1e6,
              engine="pallas")

    mf_hi = MatchedFilter(tg, precision="highest", **kw)
    mf_hi.set_data(w["data"])
    mf_hi.set_weights_channels(method="simple", normalize=True)
    d_hi = mf_hi.run_matched_filter_search(5.0, threshold_window_dur=150.0)

    mf_sc = MatchedFilter(tg, precision="screen", **kw)
    mf_sc.set_data(w["data"])
    mf_sc.set_weights_channels(method="simple", normalize=True)
    d_sc = mf_sc.run_matched_filter_search(5.0, threshold_window_dur=150.0)

    assert set(d_hi) == set(d_sc)
    n_total = 0
    for tid in d_hi:
        assert len(d_hi[tid]) == len(d_sc[tid])
        for e1, e2 in zip(d_hi[tid], d_sc[tid]):
            assert e1.origin_time == e2.origin_time
            # refined CC is float64-exact; 'highest' is f32 (~3e-7)
            assert np.isclose(e1.aux_data["cc"], e2.aux_data["cc"],
                              atol=5e-6, rtol=0)
            n_total += 1
    assert n_total >= 2


def test_screen_overflow_fallback_parity(world):
    """The batched extraction's overflow paths must stay detection-exact
    in screen mode: with the block bound forced to 1 and the candidate
    budget to 1, every active template trips `needs_rerun` (blocks_hit >
    k_blocks) or the n_above > k overflow, so detections come from the
    per-template re-extraction / host fallback -- margin widening and
    the exact refine included.  Results must match 'highest'."""
    from seismic_bpmf_tpu.detection.matched_filter import MatchedFilter

    w = world
    bf, detections = workflow.backproject_day(
        w["data"], w["net"], w["tts"], cfg=w["cfg"],
        minimum_interevent_time=10.0, threshold_window_sec=150.0,
        num_closest_stations=N_STA,
    )
    tg = workflow.build_templates(
        detections, w["net"], cfg=w["cfg"], data_reader=data_reader_hdf5,
        dedup_similarity=1.1,  # keep all: the batched path needs >=2 rows
    )
    assert tg.n_templates >= 2
    kw = dict(cfg=w["cfg"], min_channels=3, min_stations=2, max_kurto=1e6,
              engine="pallas")

    mf_hi = MatchedFilter(tg, precision="highest", **kw)
    mf_hi.set_data(w["data"])
    mf_hi.set_weights_channels(method="simple", normalize=True)
    d_hi = mf_hi.run_matched_filter_search(5.0, threshold_window_dur=150.0)

    mf_sc = MatchedFilter(tg, precision="screen", **kw)
    mf_sc.MAX_CANDIDATE_BLOCKS = 1  # force blocks_hit > k_blocks
    mf_sc.MAX_CANDIDATES = 1        # force n_above > k overflow
    mf_sc.set_data(w["data"])
    mf_sc.set_weights_channels(method="simple", normalize=True)
    n_scans = 0
    orig = mf_sc.compute_cc_time_series

    def counting(*a, **k):
        nonlocal n_scans
        n_scans += 1
        return orig(*a, **k)

    mf_sc.compute_cc_time_series = counting
    d_sc = mf_sc.run_matched_filter_search(5.0, threshold_window_dur=150.0)
    # the fallback actually fired: at least one chunk re-scanned
    assert n_scans >= 2

    assert set(d_hi) == set(d_sc)
    n_total = 0
    for tid in d_hi:
        assert len(d_hi[tid]) == len(d_sc[tid])
        for e1, e2 in zip(d_hi[tid], d_sc[tid]):
            assert e1.origin_time == e2.origin_time
            assert np.isclose(e1.aux_data["cc"], e2.aux_data["cc"],
                              atol=5e-6, rtol=0)
            n_total += 1
    assert n_total >= 2


def test_exact_cc_at_matches_oracle(world):
    """The screen refine (`_exact_cc_at`) must agree with the NumPy oracle
    CC at arbitrary lags, including out-of-bounds windows."""
    from seismic_bpmf_tpu.detection.matched_filter import MatchedFilter
    from seismic_bpmf_tpu.ops.reference import matched_filter as oracle

    w = world
    bf, detections = workflow.backproject_day(
        w["data"], w["net"], w["tts"], cfg=w["cfg"],
        minimum_interevent_time=10.0, threshold_window_sec=150.0,
        num_closest_stations=N_STA,
    )
    tg = workflow.build_templates(
        detections, w["net"], cfg=w["cfg"], data_reader=data_reader_hdf5,
    )
    mf = MatchedFilter(tg, cfg=w["cfg"], min_channels=3, min_stations=2,
                       max_kurto=1e6, engine="pallas", precision="screen")
    mf.set_data(w["data"])
    mf.set_weights_channels(method="simple", normalize=True)
    # prime tids_subset/_weights_arr without running the scan
    mf.compute_cc_time_series(tids=tg.tids[:1])
    tid = tg.tids[0]
    tt = int(tg.tindexes.loc[tid])

    cc_full = oracle(
        tg.waveforms_arr[tt : tt + 1], tg.moveouts_arr[tt : tt + 1],
        mf._weights_arr[:1], mf.data_arr, network_sum=True,
    )[0]
    n_corr = cc_full.shape[0]
    idx = np.array([0, 1, 5, n_corr // 2, n_corr - 2, n_corr - 1])
    got = mf._exact_cc_at(tid, tt, idx)
    np.testing.assert_allclose(got, cc_full[idx], atol=1e-6, rtol=0)
