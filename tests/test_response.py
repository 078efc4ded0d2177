"""Native instrument-response chain: StationXML parsing + deconvolution.

The reference does this through obspy (attach: BPMF/
data_reader_examples.py:178-189; removal: BPMF/spectrum.py:1600-1619).
These tests forward-model counts from known ground motion with an
independently-coded transfer function and check the native chain recovers
the motion: parser fields, water-level inversion, reader attachment, and
displacement recovery through `extract_windows`.
"""

import os

import numpy as np
import pytest

from seismic_bpmf_tpu.data.stationxml import (
    ChannelResponse,
    parse_stationxml,
    read_inventory,
)
from seismic_bpmf_tpu.ops.response import (
    build_inverse_filter,
    cosine_sac_taper,
    invert_spectrum_water_level,
    remove_response_arr,
    remove_response_stream,
)

SR = 100.0

# a 1 Hz geophone-like velocity response: two zeros at the origin,
# one conjugate pole pair
POLES = np.array([-4.44 + 4.44j, -4.44 - 4.44j])
ZEROS = np.array([0.0 + 0.0j, 0.0 + 0.0j])
NORM_FREQ = 5.0
SENS = 2.0e8  # counts / (m/s) at NORM_FREQ


def _a0():
    """Normalization so |pz(NORM_FREQ)| == 1 (computed independently)."""
    s = 2j * np.pi * NORM_FREQ
    pz = np.prod(s - ZEROS) / np.prod(s - POLES)
    return float(1.0 / np.abs(pz))


def _forward_counts_from_disp(disp, sr):
    """Independent forward model: displacement (m) -> counts."""
    n = len(disp)
    nfft = 1
    while nfft < 2 * n:
        nfft *= 2
    f = np.fft.rfftfreq(nfft, d=1.0 / sr)
    s = 2j * np.pi * f
    with np.errstate(divide="ignore", invalid="ignore"):
        h_vel = _a0() * SENS * (
            np.prod([s - z for z in ZEROS], axis=0)
            / np.prod([s - p for p in POLES], axis=0)
        )
    h_vel[~np.isfinite(h_vel)] = 0.0
    h_disp = h_vel * (2j * np.pi * f)  # counts per m
    return np.fft.irfft(np.fft.rfft(disp, nfft) * h_disp, nfft)[:n]


def _response():
    return ChannelResponse(
        network="XX", station="TST1", location="00", channel="HHZ",
        sensitivity=SENS, sensitivity_frequency=NORM_FREQ,
        input_units="M/S", poles=POLES, zeros=ZEROS,
        normalization_factor=_a0(),
    )


def _bandlimited_disp(rng, n, sr, f_lo=2.0, f_hi=10.0):
    from scipy.signal import butter, sosfilt

    sos = butter(4, [f_lo, f_hi], btype="band", fs=sr, output="sos")
    return 1e-6 * sosfilt(sos, rng.normal(size=n)).astype(np.float64)


STATIONXML = """<?xml version="1.0" encoding="UTF-8"?>
<FDSNStationXML xmlns="http://www.fdsn.org/xml/station/1" schemaVersion="1.1">
 <Network code="XX">
  <Station code="TST1">
   <Channel code="HHZ" locationCode="00" startDate="2010-01-01T00:00:00">
    <Response>
     <InstrumentSensitivity>
      <Value>{sens}</Value>
      <Frequency>{freq}</Frequency>
      <InputUnits><Name>M/S</Name></InputUnits>
      <OutputUnits><Name>COUNTS</Name></OutputUnits>
     </InstrumentSensitivity>
     <Stage number="1">
      <PolesZeros>
       <InputUnits><Name>M/S</Name></InputUnits>
       <OutputUnits><Name>V</Name></OutputUnits>
       <PzTransferFunctionType>LAPLACE (RADIANS/SECOND)</PzTransferFunctionType>
       <NormalizationFactor>{a0}</NormalizationFactor>
       <NormalizationFrequency>{freq}</NormalizationFrequency>
       <Zero number="0"><Real>0.0</Real><Imaginary>0.0</Imaginary></Zero>
       <Zero number="1"><Real>0.0</Real><Imaginary>0.0</Imaginary></Zero>
       <Pole number="0"><Real>-4.44</Real><Imaginary>4.44</Imaginary></Pole>
       <Pole number="1"><Real>-4.44</Real><Imaginary>-4.44</Imaginary></Pole>
      </PolesZeros>
     </Stage>
    </Response>
   </Channel>
  </Station>
 </Network>
</FDSNStationXML>
"""


@pytest.fixture
def rng():
    return np.random.default_rng(31)


class TestStationXML:
    def test_parse_fields(self, tmp_path):
        path = tmp_path / "XX.TST1.xml"
        path.write_text(
            STATIONXML.format(sens=SENS, freq=NORM_FREQ, a0=_a0())
        )
        inv = parse_stationxml(str(path))
        assert len(inv) == 1
        r = inv.get_response("XX", "TST1", "HHZ", "00")
        assert r is not None
        assert r.sensitivity == pytest.approx(SENS)
        np.testing.assert_allclose(
            np.sort_complex(r.poles), np.sort_complex(POLES)
        )
        assert len(r.zeros) == 2
        # |H_vel| at the normalization frequency equals the sensitivity
        h = r.transfer_function(np.array([NORM_FREQ]), output="VEL")
        assert np.abs(h[0]) == pytest.approx(SENS, rel=1e-6)
        # epoch coverage
        assert r.covers(1.6e9) and not r.covers(0.0)

    def test_read_inventory_glob(self, tmp_path):
        for sta in ("TST1",):
            (tmp_path / f"XX.{sta}.xml").write_text(
                STATIONXML.format(sens=SENS, freq=NORM_FREQ, a0=_a0())
            )
        inv = read_inventory(str(tmp_path / "*.xml"))
        assert len(inv) == 1

    def test_output_unit_conversion(self):
        r = _response()
        f = np.array([1.0, 5.0, 20.0])
        h_v = r.transfer_function(f, "VEL")
        h_d = r.transfer_function(f, "DISP")
        h_a = r.transfer_function(f, "ACC")
        w = 2.0 * np.pi * f
        np.testing.assert_allclose(h_d, h_v * 1j * w, rtol=1e-12)
        np.testing.assert_allclose(h_a, h_v / (1j * w), rtol=1e-12)


class TestDeconvolution:
    def test_water_level(self):
        spec = np.array([1.0, 1e-5, 0.0], complex)
        inv = invert_spectrum_water_level(spec, water_level_db=60.0)
        assert inv[0] == pytest.approx(1.0)
        # floor at max|spec| * 10^-3
        assert np.abs(inv[1]) == pytest.approx(1e3)
        assert np.abs(inv[2]) == pytest.approx(1e3)

    def test_sac_taper_shape(self):
        f = np.linspace(0.0, 50.0, 501)
        t = cosine_sac_taper(f, (1.0, 2.0, 40.0, 48.0))
        assert t[f < 1.0].max() == 0.0
        assert np.all(t[(f >= 2.0) & (f <= 40.0)] == 1.0)
        assert t[f > 48.0].max() == 0.0
        assert np.all(np.diff(t[(f >= 1.0) & (f <= 2.0)]) >= -1e-12)

    def test_recover_displacement(self, rng):
        n = 4096
        disp = _bandlimited_disp(rng, n, SR)
        counts = _forward_counts_from_disp(disp, SR)
        rec = remove_response_arr(
            counts[None, :], [_response()], SR, output="DISP",
            pre_filt=(0.5, 1.0, 40.0, 45.0), water_level_db=60.0,
        )[0]
        sl = slice(200, n - 200)  # edge effects excluded
        err = np.linalg.norm(rec[sl] - disp[sl]) / np.linalg.norm(disp[sl])
        assert err < 0.02

    def test_recover_velocity_stream(self, rng):
        from seismic_bpmf_tpu.data.stream import Stream, Trace

        n = 2048
        disp = _bandlimited_disp(rng, n, SR)
        # spectral derivative (np.gradient's 2nd-order stencil deviates
        # near Nyquist, which would dominate the comparison)
        f = np.fft.rfftfreq(n, d=1.0 / SR)
        vel = np.fft.irfft(np.fft.rfft(disp) * 2j * np.pi * f, n)
        counts = _forward_counts_from_disp(disp, SR)
        tr = Trace(counts.astype(np.float32), station="TST1", network="XX",
                   channel="HHZ", location="00", sampling_rate=SR,
                   starttime=1.6e9)
        st = Stream([tr])
        from seismic_bpmf_tpu.data.stationxml import Inventory

        n_done = remove_response_stream(
            st, Inventory([_response()]), output="VEL",
            pre_filt=(0.5, 1.0, 40.0, 45.0),
        )
        assert n_done == 1
        sl = slice(200, n - 200)
        err = (np.linalg.norm(st[0].data[sl] - vel[sl])
               / np.linalg.norm(vel[sl]))
        assert err < 0.05


class TestReaderAttach:
    def test_mseed_reader_attaches_response(self, tmp_path, rng):
        from seismic_bpmf_tpu.data.mseed import write_mseed
        from seismic_bpmf_tpu.data.readers import data_reader_mseed
        from seismic_bpmf_tpu.data.stream import Stream, Trace

        t0 = float(
            np.datetime64("2012-07-26T00:00:00", "s").astype(np.int64)
        )
        day = tmp_path / "2012" / "208"
        day.mkdir(parents=True)
        tr = Trace(rng.normal(size=2000).astype(np.float32) * 100,
                   station="TST1", network="XX", channel="HHZ",
                   location="00", sampling_rate=SR, starttime=t0)
        write_mseed(Stream([tr]), str(day / "XX.TST1.00.HHZ_20120726.mseed"),
                    encoding="FLOAT32")
        resp = tmp_path / "resp"
        resp.mkdir()
        (resp / "XX.TST1.xml").write_text(
            STATIONXML.format(sens=SENS, freq=NORM_FREQ, a0=_a0())
        )
        st = data_reader_mseed(
            str(tmp_path), network="XX", stations=["TST1"],
            starttime=np.datetime64("2012-07-26T00:00:00"),
            endtime=np.datetime64("2012-07-26T00:00:10"),
            attach_response=True,
        )
        assert len(st) == 1
        assert st[0].stats.response is not None
        assert st[0].stats.response.station == "TST1"


class TestExtractWindowsPositioning:
    def test_reader_mode_matches_reference_formula(self, tmp_path):
        """Reader-mode P/S windows start at
        ``origin_time + moveout_phase(station) - offset_phase[phase]`` per
        station (BPMF/spectrum.py:1573-1596 via the time-shifted read),
        and the noise window ends before the first P arrival."""
        from seismic_bpmf_tpu.data.events import Event
        from seismic_bpmf_tpu.data.readers import (
            data_reader_hdf5,
            write_hdf5_continuous,
        )
        from seismic_bpmf_tpu.data.stream import Stream, Trace
        from seismic_bpmf_tpu.source import extract_windows

        sr = 25.0
        t0 = float(
            np.datetime64("2012-07-26T00:00:00", "s").astype(np.int64)
        )
        ot = t0 + 120.0
        stations = ["ST1", "ST2"]
        mv = np.array([[3.0, 5.2], [4.4, 7.6]])  # (sta, [P, S]) seconds
        n = int(600 * sr)
        st = Stream()
        for s, sta in enumerate(stations):
            for cp in "NEZ":
                x = np.zeros(n, np.float32)
                x[int((ot - t0 + mv[s, 0]) * sr)] = 1.0  # P spike
                x[int((ot - t0 + mv[s, 1]) * sr)] = 2.0  # S spike
                st += Trace(x, station=sta, network="XX",
                            channel=f"HH{cp}", sampling_rate=sr,
                            starttime=t0)
        path = tmp_path / "day.h5"
        write_hdf5_continuous(str(path), st, sampling_rate=sr)

        ev = Event(
            np.datetime64(int(ot * 1e9), "ns"), mv, stations, ["P", "S"],
            data_filename="day.h5", data_path=str(tmp_path),
            sampling_rate=sr, data_reader=data_reader_hdf5,
        )
        # 0.48 s = exactly 12 samples at 25 Hz (0.5 s would straddle a
        # half-sample boundary)
        offset_phase = {"P": 0.48, "S": 0.48}
        # duration < S-P separation (2.2 s) so each phase window holds
        # exactly its own spike
        windows = extract_windows(
            ev, duration_sec=1.5, offset_ot_sec_noise=-6.0,
            offset_phase=offset_phase, integrate_to_displacement=False,
            taper_percentage=0.0,
        )
        n_off = 12  # the spike sits offset_phase into the window
        for s in range(len(stations)):
            for c in range(3):
                p_win = windows["p"][s, c]
                s_win = windows["s"][s, c]
                assert int(np.argmax(np.abs(p_win))) == n_off
                assert p_win[n_off] == pytest.approx(1.0, abs=0.15)
                assert int(np.argmax(np.abs(s_win))) == n_off
                assert s_win[n_off] == pytest.approx(2.0, abs=0.15)
                # noise window [ot-6, ot-4.5] contains no spikes
                assert np.max(np.abs(windows["noise"][s, c])) < 0.2


class TestMomentRecovery:
    @staticmethod
    def _mw_world():
        """Synthetic physical-units world: Brune displacement pulses
        encoding a known seismic moment, forward-modeled to counts
        through a known instrument response; returns (event, network,
        deconvolved windows, M0)."""
        import pandas as pd

        from seismic_bpmf_tpu.data import Network
        from seismic_bpmf_tpu.data.events import Event
        from seismic_bpmf_tpu.data.stream import Stream, Trace
        from seismic_bpmf_tpu.source import (
            compute_moment_magnitude,
            moment_to_magnitude,
        )
        from seismic_bpmf_tpu.utils.geo import compute_distances

        sr, fc, M0 = 100.0, 5.0, 1.0e13
        rho, vp, vs = 2700.0, 6000.0, 3500.0
        rad_P = np.sqrt(4.0 / 15.0)
        rad_S = np.sqrt(2.0 / 5.0)
        md = pd.DataFrame({
            "stations": ["ST1", "ST2", "ST3"],
            "networks": ["XX"] * 3,
            "latitude": [40.05, 40.10, 40.15],
            "longitude": [30.05, 30.12, 30.08],
            "elevation_m": [0.0] * 3,
        })
        net = Network.from_dataframe(md)
        ev_lon, ev_lat, ev_dep = 30.08, 40.09, 8.0
        sel = net.metadata
        dist_km = compute_distances(
            [ev_lon], [ev_lat], [ev_dep],
            sel["longitude"].values, sel["latitude"].values,
            sel["depth_km"].values,
        )[0]

        duration = 4.0
        n_win = int(duration * sr)
        mv = np.array([[3.0, 8.0]] * 3, np.float32)  # P, S (sec)
        ev = Event("2012-07-26T01:00:00", mv, list(net.stations),
                   ["P", "S"], latitude=ev_lat, longitude=ev_lon,
                   depth=ev_dep, sampling_rate=sr)
        ev.set_aux_data({"offset_P": 3.0, "offset_S": 8.0})

        def brune_pulse(omega0):
            """Real window whose repo-convention displacement spectrum
            2|X_k|/n equals omega0 / (1 + (f/fc)^2)."""
            f = np.fft.rfftfreq(n_win, d=1.0 / sr)
            amp = omega0 / (1.0 + (f / fc) ** 2)
            xk = amp * n_win / 2.0
            # linear phase centers the pulse in the window
            xk = xk * np.exp(-2j * np.pi * f * (n_win / 2) / sr)
            return np.fft.irfft(xk, n_win)

        n = int(16.0 * sr)
        ev.traces = Stream()
        for s, sta in enumerate(net.stations):
            r_m = 1000.0 * dist_km[s]
            corr_p = (4 * np.pi * np.sqrt(rho) * np.sqrt(rho)
                      * np.sqrt(vp) * vp**2.5 * r_m / rad_P)
            corr_s = (4 * np.pi * np.sqrt(rho) * np.sqrt(rho)
                      * np.sqrt(vs) * vs**2.5 * r_m / rad_S)
            for cp in "NEZ":
                d = np.zeros(n)
                # P pulse on Z, S pulse on N (RSS over components then
                # equals the single-channel amplitude)
                if cp == "Z":
                    i0 = int((3.0 - 0.5) * sr)
                    d[i0:i0 + n_win] += brune_pulse(M0 / corr_p)
                if cp == "N":
                    i0 = int((8.0 - 0.5) * sr)
                    d[i0:i0 + n_win] += brune_pulse(M0 / corr_s)
                counts = _forward_counts_from_disp(d, sr)
                tr = Trace(counts.astype(np.float32), station=sta,
                           network="XX", channel=f"HH{cp}",
                           sampling_rate=sr)
                tr.stats.response = _response()
                ev.traces += tr
        ev.duration = n / sr

        from seismic_bpmf_tpu.source import extract_windows

        windows = extract_windows(
            ev, duration_sec=duration, attach_response=True,
            taper_percentage=0.0, noise_window_sec=duration,
            offset_phase={"P": 0.5, "S": 0.5},
            pre_filt=(0.2, 0.5, 45.0, 49.0),
        )
        return ev, net, windows, M0

    def test_mw_recovered_from_counts_with_known_response(self):
        """The full physical-units chain: displacement encoding a known
        seismic moment -> counts through a known instrument response ->
        native deconvolution via extract_windows -> spectral fit recovers
        the injected Mw (the reference's obspy-based chain,
        BPMF/spectrum.py:1500-2009, done natively)."""
        from seismic_bpmf_tpu.source import (
            compute_moment_magnitude,
            moment_to_magnitude,
        )

        ev, net, windows, M0 = self._mw_world()
        spec = compute_moment_magnitude(
            ev, net, windows=windows, Q0=1e9, rho=2700.0, vp=6000.0,
            vs=3500.0, snr_threshold=2.0,
        )
        assert spec.fit_success
        mw_inj = float(moment_to_magnitude(M0))
        assert abs(spec.Mw - mw_inj) < 0.25, (
            f"recovered Mw {spec.Mw:.2f} vs injected {mw_inj:.2f}"
        )

    def test_mw_star_per_station_weighted(self):
        """Mw* (no spectral fit) through the per-station SNR/distance
        weighting (BPMF/spectrum.py:1341-1496) recovers the plateau of
        the same synthetic world."""
        from seismic_bpmf_tpu.source import (
            approximate_moment_magnitude,
            moment_to_magnitude,
        )

        ev, net, windows, M0 = self._mw_world()
        mw = approximate_moment_magnitude(
            ev, net, windows=windows, Q0=1e9, rho=2700.0, vp=6000.0,
            vs=3500.0, snr_threshold=2.0,
        )
        mw_inj = float(moment_to_magnitude(M0))
        assert mw is not None
        assert abs(mw - mw_inj) < 0.3, f"Mw* {mw:.2f} vs {mw_inj:.2f}"
        assert ev.aux_data["Mw_star"] == mw

    def test_snr_based_weights_reference_semantics(self):
        """BPMF/spectrum.py:1290-1339: clip at 1.001*threshold and
        weight_max; zero out bad channels when enough good ones exist,
        else keep only the best `max_num_bad_measurements`."""
        from seismic_bpmf_tpu.source.spectrum import snr_based_weights

        snr = np.array([0.5, 1.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0])
        w = snr_based_weights(snr, 4.0, weight_max=3.0,
                              max_num_bad_measurements=6)
        # 6 good channels -> bad ones zeroed, good ones clipped at 3.0
        assert (w[:2] == 0.0).all()
        np.testing.assert_allclose(w[2:], 3.0)
        # mostly-bad network: only the best N kept
        snr2 = np.array([0.2, 0.4, 0.6, 0.8, 1.0, 1.2, 1.4, 1.6])
        w2 = snr_based_weights(snr2, 4.0, weight_max=3.0,
                               max_num_bad_measurements=6)
        assert (w2[:2] == 0.0).all()
        assert (w2[2:] > 0.0).all()


class TestExtractWindowsResponse:
    def test_displacement_recovered_through_extract_windows(self, rng):
        """counts-with-known-response traces -> displacement windows whose
        spectral plateau matches the true displacement's (the moment is
        recovered, VERDICT round-2 item 3)."""
        from seismic_bpmf_tpu.data.events import Event
        from seismic_bpmf_tpu.data.stream import Stream, Trace
        from seismic_bpmf_tpu.source import extract_windows

        sr = SR
        n = 4096
        ev = Event(
            "2012-07-26T01:00:00",
            np.array([[1.0, 2.0]], np.float32),
            ["TST1"], ["P", "S"],
            latitude=40.0, longitude=30.0, depth=8.0, sampling_rate=sr,
        )
        ev.set_aux_data({"offset_P": 5.0, "offset_S": 8.0})
        disp = {}
        ev.traces = Stream()
        for cp in "NEZ":
            d = _bandlimited_disp(rng, n, sr)
            # in-band "event" pulse (~3 Hz; sub-band energy would rightly
            # be removed by the pre_filt taper)
            d[600:630] += 1e-5 * np.hanning(30)
            disp[cp] = d
            counts = _forward_counts_from_disp(d, sr)
            tr = Trace(counts.astype(np.float32), station="TST1",
                       network="XX", channel=f"HH{cp}", sampling_rate=sr)
            tr.stats.response = _response()
            ev.traces += tr
        ev.duration = n / sr
        windows = extract_windows(
            ev, duration_sec=3.0, attach_response=True,
            taper_percentage=0.0, noise_window_sec=3.0,
            pre_filt=(0.5, 1.0, 40.0, 45.0),
        )
        assert set(windows) == {"noise", "p", "s"}
        # the P window on Z starts at offset_P - 0.5 s = sample 450 and
        # must reproduce the true displacement there.  The expectation is
        # the displacement within the pre_filt band (deconvolution cannot
        # return energy the band taper removes).
        nfft = 8192
        f = np.fft.rfftfreq(nfft, d=1.0 / sr)
        want_full = np.fft.irfft(
            np.fft.rfft(disp["Z"], nfft)
            * cosine_sac_taper(f, (0.5, 1.0, 40.0, 45.0)),
            nfft,
        )[:n]
        got = windows["p"][0, 2]
        want = want_full[450 : 450 + got.shape[-1]]
        want = want - want.mean()
        got = got - got.mean()
        err = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert err < 0.05
        # the in-band event pulse (samples 600-630) is inside the window
        # and dominates it
        assert np.argmax(np.abs(got)) == pytest.approx(
            600 - 450 + 15, abs=3
        )


class TestPartialResponseCoverage:
    def test_unmatched_channels_zeroed_not_mixed(self, rng):
        """With responses on only some stations, the response-less
        channels must be zeroed out of the spectral windows — NOT left as
        raw counts next to deconvolved meters (an ~1e8 unit mismatch)."""
        from seismic_bpmf_tpu.data.events import Event
        from seismic_bpmf_tpu.data.stream import Stream, Trace
        from seismic_bpmf_tpu.source import extract_windows

        sr, n = SR, 4096
        ev = Event(
            "2012-07-26T01:00:00",
            np.array([[1.0, 2.0], [1.0, 2.0]], np.float32),
            ["TST1", "TST2"], ["P", "S"],
            latitude=40.0, longitude=30.0, depth=8.0, sampling_rate=sr,
        )
        ev.set_aux_data({"offset_P": 5.0, "offset_S": 8.0})
        ev.traces = Stream()
        for sta in ("TST1", "TST2"):
            for cp in "NEZ":
                d = _bandlimited_disp(rng, n, sr)
                counts = _forward_counts_from_disp(d, sr)
                tr = Trace(counts.astype(np.float32), station=sta,
                           network="XX", channel=f"HH{cp}",
                           sampling_rate=sr)
                if sta == "TST1":  # TST2 has no response metadata
                    tr.stats.response = _response()
                ev.traces += tr
        ev.duration = n / sr
        windows = extract_windows(
            ev, duration_sec=3.0, attach_response=True,
            taper_percentage=0.0, noise_window_sec=3.0,
            pre_filt=(0.5, 1.0, 40.0, 45.0),
        )
        for ph in ("noise", "p", "s"):
            assert np.all(windows[ph][1] == 0.0), ph     # TST2 zeroed
            assert np.any(windows[ph][0] != 0.0), ph     # TST1 intact
