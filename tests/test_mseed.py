"""Vendored miniSEED codec + tutorial-convention reader path.

The reference ingests miniSEED through obspy
(BPMF/data_reader_examples.py:115-214); the vendored pure-NumPy codec makes
that path run without it.  Round trips cover every supported encoding
including Steim1/Steim2 (what datacenters actually serve).
"""

import os

import numpy as np
import pytest

from seismic_bpmf_tpu.data.mseed import (
    merge_fill,
    read_mseed,
    write_mseed,
)
from seismic_bpmf_tpu.data.readers import data_reader_mseed
from seismic_bpmf_tpu.data.stream import Stream, Trace


def _walk(rng, n, scale=1000.0):
    """Integer random walk (realistic seismic count series)."""
    return np.cumsum(rng.normal(0, scale, n)).astype(np.int32)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize("encoding", ["INT32", "FLOAT32", "STEIM1",
                                      "STEIM2"])
def test_roundtrip_single_trace(tmp_path, rng, encoding):
    n = 5000
    x = _walk(rng, n)
    tr = Trace(x.astype(np.float32), station="ST1", network="XX",
               channel="HHZ", location="00", sampling_rate=25.0,
               starttime=1343264400.0)
    path = str(tmp_path / f"one_{encoding}.mseed")
    write_mseed(Stream([tr]), path, encoding=encoding)
    st = read_mseed(path)
    assert len(st) == 1
    out = st[0]
    assert out.stats.station == "ST1"
    assert out.stats.network == "XX"
    assert out.stats.channel == "HHZ"
    assert out.stats.sampling_rate == 25.0
    assert out.stats.starttime == pytest.approx(1343264400.0, abs=1e-4)
    np.testing.assert_array_equal(out.data, x.astype(np.float32))


def test_roundtrip_steim2_large_diffs(tmp_path, rng):
    """Mixed small/large differences exercise every Steim2 packing width."""
    n = 2000
    x = _walk(rng, n, scale=2.0)
    spikes = rng.integers(0, n, 50)
    # spikes sized for 10/15/30-bit Steim2 packings while staying exactly
    # representable in the Trace container's float32 samples (< 2^24)
    x[spikes] += rng.integers(-2**22, 2**22, 50).astype(np.int32)
    tr = Trace(x.astype(np.float64), station="SPIKE", network="XX",
               channel="HHZ", sampling_rate=100.0, starttime=0.0)
    path = str(tmp_path / "spike.mseed")
    write_mseed(Stream([tr]), path, encoding="STEIM2")
    out = read_mseed(path)[0]
    np.testing.assert_array_equal(out.data.astype(np.int64), x)


def test_merge_fill_gap(tmp_path, rng):
    """Two segments of the same channel with a gap merge with zero fill."""
    sr = 25.0
    a = Trace(np.ones(100, np.float32), station="G", channel="HHZ",
              sampling_rate=sr, starttime=0.0)
    b = Trace(2 * np.ones(100, np.float32), station="G", channel="HHZ",
              sampling_rate=sr, starttime=8.0)  # 100 samples gap
    merged = merge_fill(Stream([a, b]))
    assert len(merged) == 1
    data = merged[0].data
    assert len(data) == 300
    assert (data[:100] == 1).all()
    assert (data[100:200] == 0).all()
    assert (data[200:] == 2).all()


def test_merge_fill_overlap(tmp_path, rng):
    """obspy method-0 parity: conflicting overlap samples become
    fill_value; agreeing overlap samples are kept."""
    sr = 25.0
    x = np.arange(150, dtype=np.float32)
    a = Trace(x[:100], station="G", channel="HHZ", sampling_rate=sr,
              starttime=0.0)
    # agreeing overlap: b repeats a's samples 50..99, then continues
    b = Trace(x[50:150], station="G", channel="HHZ", sampling_rate=sr,
              starttime=2.0)
    merged = merge_fill(Stream([a, b]))
    np.testing.assert_array_equal(merged[0].data, x)
    # conflicting overlap: c disagrees on samples 50..99
    c = Trace(x[50:150] + 1000.0, station="G", channel="HHZ",
              sampling_rate=sr, starttime=2.0)
    merged = merge_fill(Stream([a, c]))
    data = merged[0].data
    np.testing.assert_array_equal(data[:50], x[:50])
    assert (data[50:100] == 0.0).all()
    np.testing.assert_array_equal(data[100:], x[100:] + 1000.0)


def test_data_reader_mseed_native_path(tmp_path, rng):
    """Tutorial folder convention read end to end without obspy."""
    # day 2012-07-26 = julian day 208
    day_dir = tmp_path / "2012" / "208"
    os.makedirs(day_dir)
    t0 = float(np.datetime64("2012-07-26T00:00:00", "ns").astype(np.int64)
               / 1e9)
    stations = ["DC06", "DC07"]
    for sta in stations:
        st = Stream()
        for comp in "NEZ":
            x = _walk(rng, 25 * 3600)
            st += Trace(x.astype(np.float32), station=sta, network="YH",
                        channel=f"DP{comp}", location="00",
                        sampling_rate=25.0, starttime=t0)
        write_mseed(st, str(day_dir / f"YH.{sta}.00.DP_2012208.mseed"),
                    encoding="STEIM2")
    out = data_reader_mseed(
        str(tmp_path), network="YH", stations=stations, channels="DP*",
        location="00",
        starttime="2012-07-26T00:10:00", endtime="2012-07-26T00:20:00",
    )
    assert len(out) == 6
    for tr in out:
        assert tr.stats.station in stations
        assert abs(tr.stats.starttime - (t0 + 600.0)) < 0.05
        assert len(tr.data) == pytest.approx(25 * 600, abs=2)


def test_read_into_data_container(tmp_path, rng):
    """The native mseed path feeds the Data container's day-array export."""
    from seismic_bpmf_tpu.data.waveforms import Data

    day_dir = tmp_path / "2012" / "208"
    os.makedirs(day_dir)
    t0 = float(np.datetime64("2012-07-26T00:00:00", "ns").astype(np.int64)
               / 1e9)
    st = Stream()
    for comp in "NEZ":
        st += Trace(_walk(rng, 25 * 120).astype(np.float32), station="DC06",
                    network="YH", channel=f"DP{comp}", location="00",
                    sampling_rate=25.0, starttime=t0)
    write_mseed(st, str(day_dir / "YH.DC06.00.DP_2012208.mseed"))

    data = Data(
        "2012-07-26T00:00:00", str(tmp_path),
        data_reader=data_reader_mseed, duration=60.0, sampling_rate=25.0,
    )
    data.read_waveforms(network="YH", stations=["DC06"], channels="DP*",
                        location="00")
    arr = data.get_np_array(["DC06"])
    assert arr.shape == (1, 3, 1500)
    assert np.abs(arr).sum() > 0
