"""Data-layer tests: streams, network, events/templates, HDF5 round trips,
catalog, travel-time tables."""

import os

import numpy as np
import pandas as pd
import pytest

from seismic_bpmf_tpu.data import (
    Catalog,
    Data,
    Event,
    EventGroup,
    Network,
    Stream,
    Template,
    TemplateGroup,
    Trace,
    TravelTimes,
    data_reader_hdf5,
    get_np_array,
    write_hdf5_continuous,
)


def _make_stream(rng, stations=("ST1", "ST2"), sr=25.0, n=1000, t0=0.0):
    st = Stream()
    for sta in stations:
        for comp in "NEZ":
            st += Trace(
                rng.normal(size=n).astype(np.float32),
                station=sta,
                network="XX",
                channel=f"HH{comp}",
                sampling_rate=sr,
                starttime=t0,
            )
    return st


class TestStream:
    def test_select(self, rng):
        st = _make_stream(rng)
        assert len(st.select(station="ST1")) == 3
        assert len(st.select(component="Z")) == 2
        assert len(st.select(station="ST2", component="N")) == 1

    def test_slice_and_trim(self, rng):
        st = _make_stream(rng, n=1000, sr=25.0, t0=100.0)
        sl = st.slice(110.0, 120.0)
        assert abs(sl[0].stats.starttime - 110.0) < 1e-9
        assert len(sl[0].data) == 251
        tr = st[0].copy()
        tr.trim(90.0, 150.0, pad=True)
        assert len(tr.data) == int((150 - 90) * 25) + 1
        assert tr.data[0] == 0.0  # padded region

    def test_get_np_array_aliases(self, rng):
        st = Stream()
        st += Trace(np.ones(100, np.float32), station="ST1", channel="HH1",
                    sampling_rate=25.0)
        arr = get_np_array(st, ["ST1", "ST2"], components=["N", "E", "Z"],
                           n_samples=100, verbose=False)
        assert arr.shape == (2, 3, 100)
        assert np.all(arr[0, 0] == 1.0)  # '1' aliased to 'N'
        assert np.all(arr[1] == 0.0)


class TestNetwork:
    def test_file_roundtrip(self, tmp_path):
        md = pd.DataFrame({
            "stations": ["ST1", "ST2", "ST3"],
            "networks": ["XX", "XX", "YY"],
            "latitude": [40.1, 40.5, 40.9],
            "longitude": [30.1, 30.4, 30.8],
            "elevation_m": [100.0, 250.0, 0.0],
        })
        net = Network.from_dataframe(
            md, components=["N", "E", "Z"],
            start_date="2012-07-26", end_date="2012-07-27",
        )
        p = str(tmp_path / "network.tsv")
        net.write(p)
        net2 = Network("network.tsv", str(tmp_path)).read()
        assert list(net2.stations) == ["ST1", "ST2", "ST3"]
        assert net2.components == ["N", "E", "Z"]
        np.testing.assert_allclose(net2.depth, [-0.1, -0.25, 0.0])

    def test_stations_idx(self):
        md = pd.DataFrame({
            "stations": ["A", "B", "C"],
            "networks": ["XX"] * 3,
            "latitude": [40.0, 40.5, 41.5],
            "longitude": [30.0, 30.5, 31.5],
            "elevation_m": [0.0, 0.0, 0.0],
        })
        net = Network.from_dataframe(md)
        np.testing.assert_array_equal(net.stations_idx(["C", "A"]), [2, 0])
        np.testing.assert_array_equal(net.stations_idx("B"), [1])

    def test_box_subset_distances(self):
        md = pd.DataFrame({
            "stations": ["A", "B", "C"],
            "networks": ["XX"] * 3,
            "latitude": [40.0, 40.5, 41.5],
            "longitude": [30.0, 30.5, 31.5],
            "elevation_m": [0.0, 0.0, 0.0],
        })
        net = Network.from_dataframe(md)
        sub = net.box(39.9, 41.0, 29.9, 31.0)
        assert list(sub.stations) == ["A", "B"]
        d = net.interstation_distances
        assert d.loc["A", "A"] == 0.0
        # ~70 km between A and B (0.5 deg diagonal)
        assert 60 < d.loc["A", "B"] < 80
        assert d.loc["A", "B"] == pytest.approx(d.loc["B", "A"])


class TestHDF5Data:
    def test_continuous_roundtrip(self, rng, tmp_path):
        st = _make_stream(rng, t0=1343260800.0)
        p = str(tmp_path / "day.h5")
        write_hdf5_continuous(p, st)
        data = Data("2012-07-26", p, data_reader_hdf5, duration=40.0,
                    sampling_rate=25.0)
        data.read_waveforms()
        arr = data.get_np_array(["ST1", "ST2"])
        assert arr.shape == (2, 3, 1000)
        avail = data.set_availability(["ST1", "ST2", "ST9"])
        assert bool(avail.loc["ST1"]) and not bool(avail.loc["ST9"])


def test_functional_travel_time_api(rng, tmp_path):
    """`load_travel_times` / `get_moveout_array` (BPMF/utils.py:563-659
    functional API) against the same HDF5 contract as the TravelTimes
    container, incl. flat-index source subsetting in grid order."""
    from seismic_bpmf_tpu.data import (
        TravelTimes, get_moveout_array, load_travel_times,
    )

    n_src = 12
    tt_p = {f"S{i}": rng.uniform(1, 5, n_src).astype(np.float32)
            for i in range(3)}
    tt_s = {k: (v * 1.7).astype(np.float32) for k, v in tt_p.items()}
    path = str(tmp_path / "tts.h5")
    TravelTimes.write_table(
        path, {"P": tt_p, "S": tt_s},
        {"longitude": np.linspace(30, 31, n_src),
         "latitude": np.linspace(40, 41, n_src),
         "depth": np.full(n_src, 8.0)},
    )
    tts = load_travel_times(path, ["P", "S"])
    np.testing.assert_allclose(tts["P"]["S1"], tt_p["S1"])
    arr = get_moveout_array(tts, ["S0", "S2"], ["P", "S"])
    assert arr.shape == (n_src, 2, 2)
    np.testing.assert_allclose(arr[:, 1, 1], tt_s["S2"])
    # flat-index subsetting, grid order; coords follow
    sub, coords = load_travel_times(
        path, ["P"], source_indexes=np.array([7, 2, 5]),
        return_coords=True, stations=["S0"],
    )
    np.testing.assert_allclose(sub["P"]["S0"], tt_p["S0"][[2, 5, 7]])
    # coords labels must align with the gathered (ascending grid order)
    # values even though source_indexes came unsorted
    assert list(coords.index) == [2, 5, 7]
    lons = np.linspace(30, 31, n_src)
    for i in (2, 5, 7):
        assert coords.loc[i, "longitude"] == pytest.approx(lons[i])
    np.testing.assert_allclose(
        np.sort(coords["depth"].values.astype(float)), [8.0, 8.0, 8.0]
    )
    assert list(sub.index) == ["S0"]
    # duplicate indexes collapse to unique sources instead of raising
    sub2, coords2 = load_travel_times(
        path, ["P"], source_indexes=np.array([3, 3]), return_coords=True,
        stations=["S0"],
    )
    assert list(coords2.index) == [3]
    np.testing.assert_allclose(sub2["P"]["S0"], tt_p["S0"][[3]])

    from seismic_bpmf_tpu.utils import two_point_epicentral_distance

    d = two_point_epicentral_distance(40.0, 30.0, 41.0, 30.0)
    assert 105.0 < d < 115.0  # ~1 degree of latitude


def test_data_reader_pyasdf_path(rng, monkeypatch):
    """Exercise the pyasdf reader body with a stub module implementing the
    `ASDFDataSet.waveforms.<tag>` surface the reader consumes (the real
    dependency is absent here; the code path itself must still run —
    reference contract BPMF/data_reader_examples.py:47-113)."""
    import sys
    import types

    from seismic_bpmf_tpu.data.readers import data_reader_pyasdf

    class _TS:
        def __init__(self, t):
            self.timestamp = t

    class _Stats:
        def __init__(self, sta):
            self.station, self.network = sta, "XX"
            self.channel, self.location = "HHZ", "00"
            self.sampling_rate = 25.0
            self.starttime = _TS(1343260800.0)

    class _FakeTrace:
        def __init__(self, sta, data):
            self.stats = _Stats(sta)
            self.data = data

    class _StationAccessor:
        def __init__(self, sta, data):
            self.raw_recording = [_FakeTrace(sta, data)]

    class _Waveforms:
        def __init__(self, rng):
            self._d = {
                "XX.ST1": _StationAccessor(
                    "ST1", rng.normal(size=500).astype(np.float32)),
                "XX.ST2": _StationAccessor(
                    "ST2", rng.normal(size=500).astype(np.float32)),
            }

        def list(self):
            return sorted(self._d)

        def __getitem__(self, k):
            return self._d[k]

    class _FakeDataSet:
        def __init__(self, where, mode="r"):
            self.waveforms = _Waveforms(np.random.default_rng(3))

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake = types.ModuleType("pyasdf")
    fake.ASDFDataSet = _FakeDataSet
    monkeypatch.setitem(sys.modules, "pyasdf", fake)

    st = data_reader_pyasdf("whatever.h5", stations=["ST1"])
    assert len(st) == 1
    assert st[0].stats.station == "ST1"
    assert st[0].stats.sampling_rate == 25.0
    assert len(st[0].data) == 500
    # without the station filter both stations come back
    st2 = data_reader_pyasdf("whatever.h5")
    assert sorted(tr.stats.station for tr in st2) == ["ST1", "ST2"]
    # time slicing applies
    st3 = data_reader_pyasdf(
        "whatever.h5",
        starttime=np.datetime64("2012-07-26T00:00:04"),
        endtime=np.datetime64("2012-07-26T00:00:08"),
    )
    assert len(st3[0].data) <= 101


def _make_event(rng):
    moveouts = np.array([[1.0, 2.0], [1.5, 3.0]], np.float32)
    ev = Event(
        "2012-07-26T01:02:03.5",
        moveouts,
        ["ST1", "ST2"],
        ["P", "S"],
        "day.h5",
        "/tmp",
        latitude=40.3,
        longitude=30.2,
        depth=8.0,
        sampling_rate=25.0,
    )
    ev.set_aux_data({"cc": 0.7, "n_dev": 12.3})
    return ev


class TestEvent:
    def test_constructor(self, rng):
        ev = _make_event(rng)
        assert ev.id.startswith("20120726_010203")
        assert ev.moveouts.loc["ST2", "moveouts_S"] == 3.0
        assert ev.location == [30.2, 40.3, 8.0]

    def test_hdf5_roundtrip(self, rng, tmp_path):
        ev = _make_event(rng)
        ev.picks = pd.DataFrame(
            {"P_picks": [10.0, 12.0], "P_probas": [0.9, 0.8]},
            index=pd.Index(["ST1", "ST2"], name="stations"),
        )
        fn = "events.h5"
        ev.write(fn, db_path=str(tmp_path), gid="1")
        ev2 = Event.read_from_file(fn, db_path=str(tmp_path), gid="1")
        assert str(ev2.origin_time) == str(ev.origin_time)
        np.testing.assert_allclose(
            ev2.moveouts.values, ev.moveouts.values
        )
        assert list(ev2.stations) == ["ST1", "ST2"]
        assert ev2.aux_data["cc"] == pytest.approx(0.7)
        assert ev2.picks.loc["ST2", "P_probas"] == pytest.approx(0.8)

    def test_inherit_location(self, rng):
        ev, ev2 = _make_event(rng), _make_event(rng)
        ev.cov_mat = np.eye(3) * 4.0
        ev2.longitude = 0.0
        ev2.inherit_location(ev)
        assert ev2.longitude == ev.longitude
        np.testing.assert_allclose(ev2.cov_mat, ev.cov_mat)
        ev2.hor_ver_uncertainties()
        assert ev2.aux_data["hmax_unc"] == pytest.approx(2.0)
        assert ev2.aux_data["vmax_unc"] == pytest.approx(2.0)

    def test_n_closest_stations(self, rng):
        ev = _make_event(rng)
        assert list(ev.n_closest_stations(1)) == ["ST1"]

    def test_remove_outlier_picks(self, rng):
        """Reference criterion (BPMF/dataset.py:2464-2520): drop picks
        deviating from the predicted arrival by >25% of the predicted
        travel time; short travel times are exempt."""
        # moveouts large enough that min_tt=2.0 does not exempt them
        ev = Event(
            "2012-07-26T01:02:03.5",
            np.array([[4.0, 8.0], [5.0, 10.0]], np.float32),
            ["ST1", "ST2"], ["P", "S"], sampling_rate=25.0,
        )
        ot = ev.origin_time_epoch

        def ts(sec):
            return pd.Timestamp(
                np.datetime64(int((ot + sec) * 1e9), "ns")
            )

        ev.picks = pd.DataFrame(
            {
                # ST1 P on time (4.0 predicted, 4.2 picked: 5% ok);
                # ST2 P off by 2.0 s on 5.0 s tt = 40% -> dropped
                "P_picks": [105.0, 175.0],
                "P_probas": [0.9, 0.8],
                "P_unc": [1.0, 1.0],
                "P_abs_picks": [ts(4.2), ts(7.0)],
                # ST1 S off by 3 s on 8 s tt = 37.5% -> dropped;
                # ST2 S on time
                "S_picks": [275.0, 251.0],
                "S_probas": [0.7, 0.6],
                "S_unc": [1.0, 1.0],
                "S_abs_picks": [ts(11.0), ts(10.05)],
            },
            index=pd.Index(["ST1", "ST2"], name="stations"),
        )
        ev.remove_outlier_picks(max_diff_percent=25.0)
        assert not pd.isnull(ev.picks.loc["ST1", "P_abs_picks"])
        assert pd.isnull(ev.picks.loc["ST2", "P_abs_picks"])
        assert np.isnan(ev.picks.loc["ST2", "P_picks"])
        assert pd.isnull(ev.picks.loc["ST1", "S_abs_picks"])
        assert not pd.isnull(ev.picks.loc["ST2", "S_abs_picks"])
        # min_tt exemption: tiny predicted travel time keeps a wild pick
        ev2 = Event(
            "2012-07-26T01:02:03.5",
            np.array([[0.5, 1.0]], np.float32), ["ST1"], ["P", "S"],
            sampling_rate=25.0,
        )
        ev2.picks = pd.DataFrame(
            {"P_picks": [50.0], "P_probas": [0.9], "P_unc": [1.0],
             "P_abs_picks": [pd.Timestamp(np.datetime64(
                 int((ev2.origin_time_epoch + 2.0) * 1e9), "ns"))]},
            index=pd.Index(["ST1"], name="stations"),
        )
        ev2.remove_outlier_picks(max_diff_percent=25.0, min_tt=2.0)
        assert not pd.isnull(ev2.picks.loc["ST1", "P_abs_picks"])

    def test_remove_outlier_picks_nlloc_table(self, rng):
        """The NLLoc branch: `arrival_times` as the relocation driver
        produces it (`{ph}_tt_sec` / `{ph}_residuals_sec` columns; the
        absolute-arrival column may be absent, in which case the
        predicted arrival falls back to origin time + tt)."""
        ev = Event(
            "2012-07-26T01:02:03.5",
            np.array([[4.0, 8.0], [5.0, 10.0]], np.float32),
            ["ST1", "ST2"], ["P", "S"], sampling_rate=25.0,
        )
        ot = ev.origin_time_epoch

        def ts(sec):
            return pd.Timestamp(np.datetime64(int((ot + sec) * 1e9), "ns"))

        # NLLoc-predicted travel times differ from the moveouts
        ev.arrival_times = pd.DataFrame(
            {"P_tt_sec": [4.5, 5.5], "P_residuals_sec": [0.0, 0.0],
             "S_tt_sec": [np.nan, 9.5], "S_residuals_sec": [np.nan, 0.0]},
            index=pd.Index(["ST1", "ST2"], name="stations"),
        )
        ev.picks = pd.DataFrame(
            {
                # ST1 P picked at 4.7 vs predicted 4.5 (4% ok); ST2 P at
                # 8.0 vs 5.5 = 45% -> dropped
                "P_picks": [117.0, 200.0],
                "P_probas": [0.9, 0.8],
                "P_unc": [1.0, 1.0],
                "P_abs_picks": [ts(4.7), ts(8.0)],
                # ST1 S: no NLLoc tt -> falls back to moveout (8.0), pick
                # at 8.4 = 5% ok; ST2 S at 9.6 vs NLLoc 9.5 = 1% ok
                "S_picks": [210.0, 240.0],
                "S_probas": [0.7, 0.6],
                "S_unc": [1.0, 1.0],
                "S_abs_picks": [ts(8.4), ts(9.6)],
            },
            index=pd.Index(["ST1", "ST2"], name="stations"),
        )
        ev.remove_outlier_picks(max_diff_percent=25.0)
        assert not pd.isnull(ev.picks.loc["ST1", "P_abs_picks"])
        assert pd.isnull(ev.picks.loc["ST2", "P_abs_picks"])
        assert not pd.isnull(ev.picks.loc["ST1", "S_abs_picks"])
        assert not pd.isnull(ev.picks.loc["ST2", "S_abs_picks"])


def _template_with_waveforms(rng, tmp_path):
    ev = _make_event(rng)
    # synthesize time-shifted windows directly
    from seismic_bpmf_tpu.data.stream import Stream, Trace

    ev.traces = Stream()
    for sta in ev.stations:
        for comp in "NEZ":
            ev.traces += Trace(
                rng.normal(size=200).astype(np.float32),
                station=sta, channel=f"HH{comp}", sampling_rate=25.0,
            )
    ev.duration = 8.0
    for ph, off in (("P", 1.0), ("S", 4.0)):
        ev.set_aux_data({f"offset_{ph}": off})
    for comp, ph in (("N", "S"), ("E", "S"), ("Z", "P")):
        ev.set_aux_data({f"phase_on_comp{comp}": ph})
    tp = Template.init_from_event(ev)
    tp.set_aux_data({"tid": 7})
    return tp


class TestTemplate:
    def test_moveouts_arr(self, rng, tmp_path):
        tp = _template_with_waveforms(rng, tmp_path)
        mv = tp.moveouts_arr  # (n_sta, n_comp) samples
        # N,E carry S-phase windows: (moveout_S - offset_S) * 25
        assert mv[0, 0] == int((2.0 - 4.0) * 25)
        assert mv[1, 2] == int((1.5 - 1.0) * 25)

    def test_write_read(self, rng, tmp_path):
        tp = _template_with_waveforms(rng, tmp_path)
        tp.write("template7.h5", db_path=str(tmp_path))
        tp2 = Template.read_from_file("template7.h5", db_path=str(tmp_path))
        assert tp2.tid == "7"
        np.testing.assert_allclose(tp2.moveouts_arr, tp.moveouts_arr)
        assert hasattr(tp2, "traces")
        assert tp2.waveforms_arr.shape == (2, 3, 200)


class TestTemplateGroup:
    def _group(self, rng, tmp_path):
        md = pd.DataFrame({
            "stations": ["ST1", "ST2"],
            "networks": ["XX", "XX"],
            "latitude": [40.1, 40.5],
            "longitude": [30.1, 30.4],
            "elevation_m": [0.0, 0.0],
        })
        net = Network.from_dataframe(md)
        tps = []
        for i in range(3):
            tp = _template_with_waveforms(rng, tmp_path)
            tp.set_aux_data({"tid": i})
            tp.id = str(i)
            tp.latitude = 40.0 + 0.01 * i
            tps.append(tp)
        return TemplateGroup(tps, net)

    def test_arrays(self, rng, tmp_path):
        tg = self._group(rng, tmp_path)
        assert tg.moveouts_arr.shape == (3, 2, 3)
        assert tg.waveforms_arr.shape == (3, 2, 3, 200)
        assert tg.availability_arr.all()

    def test_intertemplate_cc_and_multiples(self, rng, tmp_path):
        tg = self._group(rng, tmp_path)
        cache = str(tmp_path / "cc_cache.h5")
        cc = tg.compute_intertemplate_cc(distance_threshold=100.0,
                                         max_lag=5, cache_file=cache)
        # second call comes from the HDF5 cache, bit-identical
        cc2 = tg.compute_intertemplate_cc(distance_threshold=100.0,
                                          max_lag=5, cache_file=cache)
        np.testing.assert_array_equal(cc.values, cc2.values)
        import os
        assert os.path.isfile(cache)
        assert np.allclose(np.diag(cc.values), 1.0)
        assert (cc.values <= 1.0 + 1e-5).all()
        cat = pd.DataFrame({
            "origin_time": [0.0, 1.0, 50.0],
            "tid": ["0", "1", "2"],
            "cc": [0.9, 0.5, 0.8],
        })
        out = tg.remove_multiples(cat, dt_criterion=3.0,
                                  distance_criterion=100.0,
                                  similarity_criterion=2.0)
        assert list(out["unique_event"]) == [True, False, True]

    def test_directional_errors_anisotropic(self, rng, tmp_path):
        """A covariance elongated north-south gives a larger directional
        error toward a northern neighbor than the reference's default; a
        template with no uncertainty info gets the 15 km default."""
        tg = self._group(rng, tmp_path)
        # templates lie along latitude (same longitude): direction ~ N-S
        # (BPMF/dataset.py:4594-4663 quadratic form sqrt(3.52 u^T C u))
        cov_ns = np.diag([0.01, 4.0, 0.01])  # km^2, E-N-Z
        tg.templates[0].cov_mat = cov_ns
        de = tg.directional_errors
        expect_ns = np.sqrt(3.52 * 4.0)
        assert de.loc["0", "1"] == pytest.approx(expect_ns, rel=0.05)
        # no cov/aux on template 1 -> reference default
        assert de.loc["1", "0"] == pytest.approx(15.0)
        assert de.loc["0", "0"] == 0.0  # self-direction is a zero vector
        # ellipsoid separation = distance - both directional errors
        ell = tg.ellipsoid_distances
        d = tg.intertemplate_distances
        assert ell.loc["0", "1"] == pytest.approx(
            d.loc["0", "1"] - de.loc["0", "1"] - de.loc["1", "0"], abs=1e-5
        )
        # reference-name aliases resolve to the same tables
        assert tg.dir_errors is tg.directional_errors
        assert (tg.ellipsoid_dist.values == ell.values).all()

    def test_directional_errors_hmax_vmax_fallback(self, rng, tmp_path):
        tg = self._group(rng, tmp_path)
        tg.templates[0].set_aux_data({"hmax_unc": 2.0, "vmax_unc": 0.5})
        de = tg.directional_errors
        # neighbors are horizontal: error ~ hmax
        assert de.loc["0", "1"] == pytest.approx(2.0, rel=0.05)


class TestCatalog:
    def test_from_events_and_concat(self, rng):
        evs = [_make_event(rng) for _ in range(3)]
        cat = Catalog.read_from_events(evs, extra_attributes=["cc"])
        assert cat.n_events == 3
        assert "cc" in cat.catalog.columns
        cat2 = Catalog.concatenate([cat, cat])
        assert cat2.n_events == 6

    def test_column_properties(self, rng):
        """Reference-parity column accessors (BPMF/dataset.py:343-358)."""
        cat = Catalog.read_from_events([_make_event(rng) for _ in range(2)])
        assert len(cat.origin_time) == 2
        np.testing.assert_allclose(cat.latitude, [40.3, 40.3])
        np.testing.assert_allclose(cat.longitude, [30.2, 30.2])
        np.testing.assert_allclose(cat.depth, [8.0, 8.0])

    def test_detection_file(self, rng, tmp_path):
        evs = [_make_event(rng) for _ in range(2)]
        for i, ev in enumerate(evs):
            ev.write("dets.h5", db_path=str(tmp_path), gid=str(i))
        cat = Catalog.read_from_detection_file("dets.h5",
                                               db_path=str(tmp_path))
        assert cat.n_events == 2
        assert cat.catalog["cc"].iloc[0] == pytest.approx(0.7)


class TestTravelTimes:
    def test_roundtrip_and_moveouts(self, tmp_path, rng):
        n_src = 12
        coords = {
            "longitude": np.linspace(30, 31, n_src),
            "latitude": np.linspace(40, 41, n_src),
            "depth": np.full(n_src, 8.0),
        }
        tts = {
            "P": {"ST1": rng.uniform(1, 5, n_src).astype(np.float32),
                  "ST2": rng.uniform(1, 5, n_src).astype(np.float32)},
            "S": {"ST1": rng.uniform(2, 9, n_src).astype(np.float32),
                  "ST2": rng.uniform(2, 9, n_src).astype(np.float32)},
        }
        p = str(tmp_path / "tts.h5")
        TravelTimes.write_table(p, tts, coords)
        tt = TravelTimes("tts.h5", str(tmp_path))
        tt.read(["P", "S"], read_coords=True)
        tt.convert_to_samples(25.0)
        arr = tt.get_travel_times_array(
            units="samples", stations=["ST1", "ST2"], phases=["P", "S"],
            relative_to_first=True,
        )
        assert arr.shape == (n_src, 2, 2)
        assert arr.min() == 0 or (arr.min(axis=(1, 2)) == 0).all()
        assert hasattr(tt, "moveout_to_tt")
        # reference-name aliases (BPMF/template_search.py:57-80)
        assert tt.num_sources == tt.n_sources
        assert tt.tts is tt.travel_times

    def test_source_subset(self, tmp_path, rng):
        n_src = 10
        coords = {k: np.arange(n_src, dtype=float)
                  for k in ("longitude", "latitude", "depth")}
        tts = {"P": {"ST1": np.arange(n_src, dtype=np.float32)}}
        p = str(tmp_path / "tts.h5")
        TravelTimes.write_table(p, tts, coords)
        tt = TravelTimes("tts.h5", str(tmp_path))
        tt.read(["P"], source_indexes=np.array([2, 5, 7]), read_coords=True)
        assert tt.n_sources == 3
        np.testing.assert_allclose(tt.travel_times.loc["ST1", "P"], [2, 5, 7])


class TestHostOps:
    def test_flag_multiples_native(self):
        from seismic_bpmf_tpu.ops import host_ops

        if not host_ops.available():
            pytest.skip("libhost_ops.so not built")
        times = np.array([0.0, 1.0, 2.0, 50.0, 51.0], np.float64)
        tid_idx = np.array([0, 1, 0, 1, 1], np.int64)
        metric = np.array([0.9, 0.5, 0.7, 0.3, 0.8], np.float32)
        dist = np.zeros((2, 2), np.float32)  # all templates co-located
        uniq = host_ops.flag_multiples(
            times, tid_idx, metric, dist=dist,
            dt_criterion=3.0, dist_criterion=5.0,
        )
        # group {0,1,2} -> keep idx 0 (metric .9); group {3,4} -> keep idx 4
        assert list(uniq) == [True, False, False, False, True]

    def test_dedup_large_series_native_matches_oracle(self, rng):
        from seismic_bpmf_tpu.ops import host_ops
        from seismic_bpmf_tpu.ops import reference as ref

        if not host_ops.available():
            pytest.skip("libhost_ops.so not built")
        cc = rng.random(200000).astype(np.float32)
        thr = np.full(200000, 0.999, np.float32)
        want = ref.select_cc_indexes(cc, thr, 50)
        got = host_ops.select_cc_indexes(cc, thr, 50)
        np.testing.assert_array_equal(got, want)


class TestAuxDatabase:
    def test_update_aux_data_in_place(self, rng, tmp_path):
        ev = _make_event(rng)
        ev.write("db.h5", db_path=str(tmp_path), gid="3")
        ev2 = Event.read_from_file("db.h5", db_path=str(tmp_path), gid="3")
        ev2.set_aux_data({"Mw": 3.2, "cc": 0.99})
        ev2.update_aux_data_database(db_path=str(tmp_path))
        ev3 = Event.read_from_file("db.h5", db_path=str(tmp_path), gid="3")
        assert ev3.aux_data["Mw"] == pytest.approx(3.2)
        assert ev3.aux_data["cc"] == pytest.approx(0.99)
        assert ev3.aux_data["n_dev"] == pytest.approx(12.3)  # untouched


class TestSetNetwork:
    def test_template_group_set_network(self, rng, tmp_path):
        tg = TestTemplateGroup()._group(rng, tmp_path)
        full = tg.waveforms_arr
        tg.normalize()
        sub = tg.network.subset(["ST1"], tg.network.components,
                                method="keep")
        tg.set_network(sub)
        assert tg.waveforms_arr.shape[1] == 1
        assert tg.moveouts_arr.shape[1] == 1
        # normalization re-applied: unit rms on nonzero channels
        rms = np.std(tg.waveforms_arr, axis=-1)
        nz = rms > 0
        assert np.allclose(rms[nz], 1.0, atol=1e-5)


class TestViz:
    def test_plots_smoke(self, rng, tmp_path):
        import matplotlib
        matplotlib.use("Agg")
        from seismic_bpmf_tpu import viz

        tg = TestTemplateGroup()._group(rng, tmp_path)
        cat = Catalog.read_from_dataframe(pd.DataFrame({
            "longitude": [30.0, 30.1, 30.2],
            "latitude": [40.0, 40.05, 40.1],
            "depth": [5.0, 7.0, 9.0],
            "origin_time": pd.to_datetime(
                ["2012-07-26T00:00:00", "2012-07-26T06:00:00",
                 "2012-07-26T06:30:00"]),
            "tid": ["0", "0", "1"],
        }))
        figs = [
            viz.plot_template(tg.templates[0]),
            viz.plot_event(tg.templates[0]),
            viz.plot_catalog(cat),
            viz.plot_recurrence_times(cat, tid="0"),
            viz.plot_time_of_day(cat),
            viz.plot_space_time(cat),
            viz.plot_detection_matrix(
                rng.normal(size=(4, 200)).astype(np.float32),
                ["ST1"], 25.0),
            viz.plot_detection(
                tg.templates[0],
                context=rng.normal(size=2000).astype(np.float32),
                context_sr=25.0, context_label="max beam"),
        ]
        import matplotlib.pyplot as plt
        import matplotlib.pyplot as _plt
        _net_md = pd.DataFrame({
            "stations": ["ST1"], "networks": ["XX"], "latitude": [40.0],
            "longitude": [30.0], "elevation_m": [0.0]})
        Network.from_dataframe(_net_md).plot_map()
        ax = viz.initialize_map(
            (29.9, 30.3), (39.9, 40.2),
            seismic_stations={"longitude": [30.0], "latitude": [40.0],
                              "stations": ["ST1"]},
        )
        viz.add_scale_bar(ax, 10.0)
        ev = tg.templates[0]
        ev.set_aux_data({"hmax_unc": 2.0, "hmin_unc": 1.0,
                         "az_hmax_unc": 30.0, "vmax_unc": 3.0})
        viz.uncertainty_ellipse(ev)
        viz.vertical_uncertainty_ellipse(ev)
        # class-method delegations
        plt.close(tg.templates[0].plot())
        plt.close(cat.plot_map())
        plt.close(cat.plot_time_of_day())
        plt.close(cat.plot_space_time())
        plt.close(cat.plot_recurrence_times())
        for f in figs:
            plt.close(f)
        plt.close("all")


class TestMultipletUtilities:
    """Modernized deprecated reference utils: CC-template clustering,
    detection-waveform fetch, SVDWF multiplet stacking
    (BPMF/utils.py:775-1244)."""

    def _detections(self, rng, tmp_path, tp, n_det=6):
        from seismic_bpmf_tpu.data.stream import Stream, Trace

        evs = []
        for i in range(n_det):
            ev = _make_event(rng)
            ev.id = f"det{i}"
            ev.traces = Stream()
            for sta in ev.stations:
                for comp in "NEZ":
                    # common signal + per-event noise: SVDWF must recover
                    # the common part
                    x = (np.sin(2 * np.pi * 3.0 * np.arange(100) / 25.0)
                         + 0.3 * rng.normal(size=100)).astype(np.float32)
                    ev.traces += Trace(x, station=sta, channel=f"HH{comp}",
                                       sampling_rate=25.0)
            ev.set_aux_data({"cc": 0.4 + 0.1 * i})
            evs.append(ev)
        import h5py

        fn = f"detections_tp{tp.tid}.h5"
        with h5py.File(str(tmp_path / fn), "w") as f:
            for ev in evs:
                ev.write(fn, gid=ev.id, hdf5_file=f, save_waveforms=True)
        return evs

    def test_fetch_detection_waveforms(self, rng, tmp_path):
        from seismic_bpmf_tpu.utils import fetch_detection_waveforms

        tp = _template_with_waveforms(rng, tmp_path)
        self._detections(rng, tmp_path, tp)
        wf, ccs, ids = fetch_detection_waveforms(
            tp, db_path=str(tmp_path), return_event_ids=True,
        )
        assert wf.shape == (6, 2, 3, 100)
        # ordered by CC descending
        assert list(ccs) == sorted(ccs, reverse=True)
        # rms-normalized per (event, station)
        np.testing.assert_allclose(wf.std(axis=(2, 3)), 1.0, atol=1e-5)
        # top-N selection keeps the N best CCs
        wf2, ccs2 = fetch_detection_waveforms(
            tp, db_path=str(tmp_path), max_n_events=3,
        )
        assert wf2.shape[0] == 3
        assert min(ccs2) >= max(ccs) - 0.21

    def test_svdwf_multiplets(self, rng, tmp_path):
        from seismic_bpmf_tpu.utils import svdwf_multiplets

        tp = _template_with_waveforms(rng, tmp_path)
        self._detections(rng, tmp_path, tp)
        stack = svdwf_multiplets(tp, db_path=str(tmp_path))
        arr = stack.waveforms_arr
        assert arr.shape == (2, 3, 100)
        # the stack must correlate with the common injected signal far
        # better than a single noisy detection does on average
        sig = np.sin(2 * np.pi * 3.0 * np.arange(100) / 25.0)
        c = np.corrcoef(arr[0, 0], sig)[0, 1]
        assert c > 0.95

    def test_stack_read_waveforms_reslices(self, rng, tmp_path):
        """Stack.read_waveforms re-slices phase windows from the stacked
        traces (reference parity BPMF/dataset.py:5451-5523): shrinking
        the pre-pick offset trims the window front, and the result is
        zero-padded where the stack has no samples."""
        from seismic_bpmf_tpu.utils import svdwf_multiplets

        tp = _template_with_waveforms(rng, tmp_path)
        self._detections(rng, tmp_path, tp)
        stack = svdwf_multiplets(tp, db_path=str(tmp_path))
        full = stack.waveforms_arr.copy()
        sr = stack.sr
        # original extraction offsets: P=1.0s, S=4.0s (aux offset_P/S);
        # re-read with smaller offsets -> windows start later in the stack
        stack.read_waveforms(
            2.0, offset_phase={"P": 0.5, "S": 2.0},
        )
        arr = stack.waveforms_arr
        n = int(2.0 * sr)
        assert arr.shape[-1] == n
        # Z carries P: new window starts (1.0-0.5)s into the old one
        k = int(0.5 * sr)
        np.testing.assert_allclose(arr[0, 2], full[0, 2, k:k + n],
                                   atol=1e-6)
        # N carries S: starts (4.0-2.0)s in
        k = int(2.0 * sr)
        np.testing.assert_allclose(arr[0, 0], full[0, 0, k:k + n],
                                   atol=1e-6)
        # a window reaching past the stack end is zero-padded
        stack.read_waveforms(6.0, offset_phase={"P": 0.5, "S": 2.0})
        tail = stack.waveforms_arr[0, 2]
        assert tail.shape[-1] == int(6.0 * sr)
        assert (tail[-int(2.0 * sr):] == 0.0).all()
        # origin shift helper (reference Stack.set_arrival_times_from_moveouts)
        ot0 = stack.origin_time_epoch
        stack.set_arrival_times_from_moveouts(offset_ot=3.0)
        assert stack.origin_time_epoch == pytest.approx(ot0 + 3.0)
        assert "P_tt_sec" in stack.arrival_times.columns

    def test_cluster_templates(self, rng, tmp_path):
        from seismic_bpmf_tpu.utils import cluster_templates

        md = pd.DataFrame({
            "stations": ["ST1", "ST2"],
            "networks": ["XX", "XX"],
            "latitude": [40.1, 40.5],
            "longitude": [30.1, 30.4],
            "elevation_m": [0.0, 0.0],
        })
        net = Network.from_dataframe(md)
        tps = []
        for i in range(4):
            tp = _template_with_waveforms(rng, tmp_path)
            tp.set_aux_data({"tid": i})
            tp.id = str(i)
            tps.append(tp)
        tg = TemplateGroup(tps, net)
        # hand-set the CC matrix: {0, 1} similar, {2, 3} similar
        cc = np.array([
            [1.0, 0.9, 0.1, 0.1],
            [0.9, 1.0, 0.1, 0.1],
            [0.1, 0.1, 1.0, 0.8],
            [0.1, 0.1, 0.8, 1.0],
        ])
        tg._intertemplate_cc = pd.DataFrame(cc)
        labels, clusters = cluster_templates(tg, clustering_threshold=0.33)
        assert labels[0] == labels[1]
        assert labels[2] == labels[3]
        assert labels[0] != labels[2]
        assert sorted(map(sorted, clusters)) == [[0, 1], [2, 3]]


class TestEventAuxMethods:
    """Reference dataset.py small-method parity: arrival tables from
    moveouts, source-receiver distances, distant-station pruning,
    origin-time refresh, peak amplitudes."""

    def _net(self):
        md = pd.DataFrame({
            "stations": ["ST1", "ST2"],
            "networks": ["XX", "XX"],
            "latitude": [40.3, 41.2],     # ST2 ~ 100 km away
            "longitude": [30.2, 30.2],
            "elevation_m": [0.0, 0.0],
        })
        return Network.from_dataframe(md)

    def test_arrival_times_from_moveouts(self, rng):
        ev = _make_event(rng)
        ev.set_arrival_times_from_moveouts()
        at = ev.arrival_times
        assert at.loc["ST2", "S_tt_sec"] == pytest.approx(3.0)
        dt = (at.loc["ST1", "P_abs_arrival_times"]
              - pd.Timestamp(str(ev.origin_time)))
        assert dt.total_seconds() == pytest.approx(1.0)

    def test_source_receiver_dist_and_pruning(self, rng):
        ev = _make_event(rng)
        net = self._net()
        d = ev.set_source_receiver_dist(net)
        assert d.loc["ST1"] < 15.0 < d.loc["ST2"]
        assert (ev.source_receiver_epicentral_dist.values
                <= ev.source_receiver_dist.values + 1e-9).all()
        ev.picks = pd.DataFrame(
            {"P_abs_picks": [pd.Timestamp("2012-07-26T01:02:04.5")] * 2},
            index=pd.Index(["ST1", "ST2"], name="stations"),
        )
        ev.remove_distant_stations(max_distance_km=50.0)
        assert not pd.isnull(ev.picks.loc["ST1", "P_abs_picks"])
        assert pd.isnull(ev.picks.loc["ST2", "P_abs_picks"])

    def test_update_picks_and_travel_times(self, rng):
        ev = _make_event(rng)
        ev.set_arrival_times_from_moveouts()
        ev.picks = pd.DataFrame(
            {"P_abs_picks": [pd.Timestamp("2012-07-26T01:02:05.5"),
                             pd.NaT]},
            index=pd.Index(["ST1", "ST2"], name="stations"),
        )
        # shift the origin back one second: relative times grow by 1
        ev.origin_time = np.datetime64("2012-07-26T01:02:02.5", "ns")
        ev.update_picks()
        ev.update_travel_times()
        assert ev.picks.loc["ST1", "P_picks_sec"] == pytest.approx(3.0)
        assert ev.arrival_times.loc["ST1", "P_tt_sec"] == pytest.approx(2.0)
        assert ev.arrival_times.loc["ST2", "S_tt_sec"] == pytest.approx(4.0)

    def test_get_peak_amplitudes(self, rng, tmp_path):
        tp = _template_with_waveforms(rng, tmp_path)
        # inject a DC offset: peaks must be offset-immune (the reference
        # demeans before the max, BPMF/dataset.py:1494-1519)
        for tr in tp.traces:
            tr.data = tr.data + 1000.0
        peaks = tp.get_peak_amplitudes()
        arr = tp.waveforms_arr
        dm = arr - arr.mean(axis=-1, keepdims=True)
        np.testing.assert_allclose(peaks, np.abs(dm).max(axis=-1))
        assert peaks.max() < 100.0  # not polluted by the 1000-count DC

    def test_fetch_refilter(self, rng, tmp_path):
        """Refilter variant re-reads raw data, bandpasses and decimates."""
        from seismic_bpmf_tpu.data import data_reader_hdf5
        from seismic_bpmf_tpu.data.readers import write_hdf5_continuous
        from seismic_bpmf_tpu.data.stream import Stream, Trace
        from seismic_bpmf_tpu.utils import fetch_detection_waveforms_refilter

        sr, n = 25.0, 4000
        st = Stream()
        for sta in ("ST1", "ST2"):
            for comp in "NEZ":
                x = rng.normal(size=n).astype(np.float32)
                st += Trace(x, station=sta, network="XX",
                            channel=f"HH{comp}", sampling_rate=sr,
                            starttime=1343264460.0)  # 01:01:00, covers the event
        day_file = str(tmp_path / "day.h5")
        write_hdf5_continuous(day_file, st)

        tp = _template_with_waveforms(rng, tmp_path)
        import h5py

        evs = []
        for i in range(3):
            ev = _make_event(rng)
            ev.id = f"det{i}"
            ev.where = day_file
            ev.set_aux_data({"cc": 0.5 + 0.1 * i})
            evs.append(ev)
        fn = f"detections_tp{tp.tid}.h5"
        with h5py.File(str(tmp_path / fn), "w") as f:
            for ev in evs:
                ev.write(fn, gid=ev.id, hdf5_file=f)
        wf, ccs = fetch_detection_waveforms_refilter(
            tp, freqmin=2.0, freqmax=8.0, duration=8.0,
            db_path=str(tmp_path), data_reader=data_reader_hdf5,
            target_sr=12.5,
        )
        assert wf.shape == (3, 2, 3, int(8.0 * 12.5))
        np.testing.assert_allclose(wf.std(axis=(2, 3)), 1.0, atol=1e-4)
