"""PhaseNet model tests + NLLoc glue + spectrum/magnitude tests."""

import numpy as np
import pandas as pd
import pytest


class TestPhaseNet:
    def test_forward_shapes(self, rng):
        import jax.numpy as jnp

        from seismic_bpmf_tpu.models import PhaseNet, init_phasenet

        model, variables = init_phasenet(window=3001)
        x = jnp.asarray(rng.normal(size=(2, 3001, 3)).astype(np.float32))
        probas = model.apply(variables, x, train=False)
        assert probas.shape == (2, 3001, 3)
        np.testing.assert_allclose(
            np.asarray(probas).sum(-1), 1.0, rtol=1e-5
        )

    def test_picker_protocol(self, rng):
        from seismic_bpmf_tpu.models import init_phasenet, make_picker

        model, variables = init_phasenet(window=3001)
        picker = make_picker(model, variables)
        x = rng.normal(size=(2, 3, 6000)).astype(np.float32)
        probas = picker(x)
        assert probas.shape == (2, 2, 6000)
        assert np.all(np.asarray(probas) >= 0.0)

    def test_train_step_reduces_loss(self, rng):
        import jax
        import jax.numpy as jnp
        import optax

        from seismic_bpmf_tpu.models import PhaseNet, make_train_step
        from seismic_bpmf_tpu.models.phasenet import gaussian_pick_labels

        window = 256
        model = PhaseNet(depth=3, filters_root=4)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, window, 3)), train=False
        )
        optimizer = optax.adam(1e-2)
        params = variables["params"]
        opt_state = optimizer.init(params)
        state = (params, variables["batch_stats"], opt_state)
        step = jax.jit(make_train_step(model, optimizer))
        x = jnp.asarray(rng.normal(size=(8, window, 3)).astype(np.float32))
        picks = np.stack([np.full(8, 60.0), np.full(8, 180.0)], axis=1)
        labels = jnp.asarray(gaussian_pick_labels(picks, window))
        losses = []
        for _ in range(5):
            state, loss = step(state, (x, labels))
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_normalize_batch_device_matches_numpy(self, rng):
        from seismic_bpmf_tpu.ops.picks import (
            normalize_batch,
            normalize_batch_np,
        )

        x = rng.normal(size=(2, 3, 5000)).astype(np.float32) * 10 + 3
        want = normalize_batch_np(x, normalization_window_sample=1000)
        got = np.asarray(normalize_batch(x, normalization_window_sample=1000))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestNLLocGlue:
    def _picks(self):
        return pd.DataFrame(
            {
                "P_abs_picks": [pd.Timestamp("2012-07-26T01:00:02.5"),
                                pd.NaT],
                "S_abs_picks": [pd.Timestamp("2012-07-26T01:00:04.25"),
                                pd.Timestamp("2012-07-26T01:00:05.0")],
            },
            index=pd.Index(["ST1", "ST2"], name="stations"),
        )

    def test_obs_roundtrip_format(self, tmp_path):
        from seismic_bpmf_tpu.location import write_nlloc_obs

        write_nlloc_obs(
            "2012-07-26T01:00:00", self._picks(), ["ST1", "ST2"],
            "test.obs", path=str(tmp_path),
        )
        lines = open(tmp_path / "test.obs").read().splitlines()
        # 2 stations x 2 phases + trailing blank
        assert len([l for l in lines if l.strip()]) == 4
        p_line = [l for l in lines if l.startswith("ST1\t") and "\tP\t" in l][0]
        fields = p_line.split("\t")
        assert fields[4] == "P" and fields[9] == "GAU"
        assert fields[-1] == "1"  # real pick weight
        fake = [l for l in lines if l.startswith("ST2\t") and "\tP\t" in l][0]
        assert fake.split("\t")[-1] == "0"  # placeholder weight

    def test_hyp_parsing(self, tmp_path):
        from seismic_bpmf_tpu.location import read_nlloc_outputs

        hyp = """NLLOC "loc.1" "LOCATED" "see comment"
SIGNATURE "x"
GEOGRAPHIC  OT 2012 07 26 01 00 2.125  Lat 40.3123 Long 30.2456 Depth 8.75
QUALITY  Pmax 1e10 MFmin 1 MFmax 2 RMS 0.123 Nphs 8 Gap 100 Dist 10 Mamp 0 0 Mdur 0 0
STATISTICS  ExpectX 1 Y 2 Z 3  CovXX 0.4 XY 0.01 XZ -0.02 YY 0.3 YZ 0.03 ZZ 0.6 EllAz1 0 Dip1 0 Len1 0 Az2 0 Dip2 0 Len2 0 Len3 0
STAT_GEOG  ExpectLat 40.3125 Long 30.2458 Depth 8.70
PHASE ID Ins Cmp On Pha  FM Date HrMn Sec Err ErrMag Coda Amp Per Prior > TTpred Res Weight StaLoc(X Y Z) SDist SAzim RAz RDip RQual Tcorr
ST1    ?    ?    ? P      ? 20120726 0100    2.5000 GAU  4.00e-02 -1.00e+00 -1.00e+00 -1.00e+00    1.0000 >    2.3456   0.0544    1.0     1.0 2.0 -0.1    10.0  90.0  90.0  90.0  9  0.0
ST1    ?    ?    ? S      ? 20120726 0100    4.2500 GAU  4.00e-02 -1.00e+00 -1.00e+00 -1.00e+00    1.0000 >    4.1000   0.0250    1.0     1.0 2.0 -0.1    10.0  90.0  90.0  90.0  9  0.0
END_PHASE
END_NLLOC
"""
        (tmp_path / "ev.hyp").write_text(hyp)
        hypo, predicted = read_nlloc_outputs("ev.hyp", str(tmp_path))
        assert hypo["success"]
        assert hypo["latitude"] == pytest.approx(40.3123)
        assert hypo["longitude"] == pytest.approx(30.2456)
        assert hypo["depth"] == pytest.approx(8.75)
        assert hypo["tt_rms"] == pytest.approx(0.123)
        # covariance: z-flip makes XZ positive
        assert hypo["cov_mat"][0, 2] == pytest.approx(0.02)
        assert hypo["cov_mat"][2, 0] == pytest.approx(0.02)
        assert hypo["cov_mat"][2, 2] == pytest.approx(0.6)
        assert predicted.loc["ST1", "P_tt_sec"] == pytest.approx(2.3456)
        assert predicted.loc["ST1", "S_residuals_sec"] == pytest.approx(0.025)


class TestSpectrum:
    def test_conversions(self):
        from seismic_bpmf_tpu.source import (
            magnitude_to_moment,
            moment_to_magnitude,
        )

        assert moment_to_magnitude(magnitude_to_moment(3.5)) == pytest.approx(
            3.5
        )

    def test_crack_relations_invert(self):
        from seismic_bpmf_tpu.source import (
            fc_circular_crack,
            stress_drop_circular_crack,
        )

        fc = fc_circular_crack(3.0, stress_drop_Pa=1e6, phase="s")
        sd = stress_drop_circular_crack(3.0, fc, phase="s")
        assert sd == pytest.approx(1e6, rel=1e-6)

    def test_brune_fit_recovers_parameters(self, rng):
        from seismic_bpmf_tpu.source.spectrum import Spectrum, brune

        freqs = np.linspace(0.5, 12.0, 40)
        true_m0, true_fc = 1.0e13, 4.0
        spec = Spectrum()
        noisy = brune(freqs, true_m0, true_fc) * np.exp(
            0.02 * rng.normal(size=len(freqs))
        )
        spec.average_spectrum = pd.Series(noisy, index=freqs)
        m0, fc = spec.fit_average_spectrum(model="brune")
        assert m0 == pytest.approx(true_m0, rel=0.1)
        assert fc == pytest.approx(true_fc, rel=0.1)
        assert 2.5 < spec.Mw < 3.5

    def test_per_channel_spectrum_mode(self, rng):
        """stack_components=False keeps one row per channel and corrections
        broadcast station factors onto channel rows."""
        from seismic_bpmf_tpu.source.spectrum import Spectrum

        stations = ["ST1", "ST2"]
        windows = {
            ph: rng.normal(size=(2, 3, 256)).astype(np.float32)
            for ph in ("noise", "p", "s")
        }
        spec = Spectrum()
        spec.compute_spectrum(windows, stations, 25.0,
                              stack_components=False)
        assert list(spec.spectra["p"].index) == [
            "ST1.N", "ST1.E", "ST1.Z", "ST2.N", "ST2.E", "ST2.Z"
        ]
        spec.compute_signal_to_noise_ratio()
        dist = pd.Series([10.0, 20.0], index=stations)
        tts = pd.DataFrame({"P": [2.0, 3.0], "S": [4.0, 6.0]},
                           index=stations)
        spec.set_Q_model(Q0=200.0)
        spec.compute_correction_factor(dist, tts)
        spec.correct_geometrical_spreading()
        spec.correct_attenuation()
        # same station factor applied to all three channel rows
        p = spec.spectra["p"]
        assert p.shape[0] == 6
        assert np.isfinite(p.values).all()
        avg = spec.compute_network_average_spectrum("p", snr_threshold=0.0)
        assert np.isfinite(avg.values).any()

    def test_resample_and_target_frequencies(self, rng):
        """Reference-parity Spectrum.resample / set_target_frequencies
        (BPMF/spectrum.py:851-941): linear interpolation onto the target
        grid, bins past the original bandwidth zeroed."""
        from seismic_bpmf_tpu.source.spectrum import Spectrum

        stations = ["ST1", "ST2"]
        windows = {
            ph: rng.normal(size=(2, 3, 256)).astype(np.float32)
            for ph in ("noise", "p", "s")
        }
        spec = Spectrum()
        spec.compute_spectrum(windows, stations, 25.0)
        old = spec.spectra["p"].copy()
        old_freqs = np.asarray(old.columns, float)
        spec.set_target_frequencies(0.5, 30.0, 20)  # beyond Nyquist
        assert len(spec.frequencies) == 20
        assert spec.frequencies[0] == pytest.approx(0.5)
        spec.resample(spec.frequencies, ["p", "s"])
        p = spec.spectra["p"]
        assert list(p.index) == list(old.index)
        new_freqs = np.asarray(p.columns, float)
        assert len(new_freqs) == 20
        # in-band values interpolate the original spectrum
        k = 5  # an interior target frequency well inside the band
        expected = np.interp(new_freqs[k], old_freqs,
                             np.abs(old.values[0]))
        assert p.values[0, k] == pytest.approx(expected, rel=1e-6)
        # bins at/above 0.99 * original fmax are zeroed
        outside = new_freqs >= 0.99 * old_freqs.max()
        assert outside.any()
        assert (p.values[:, outside] == 0.0).all()
        # noise spectrum untouched (not in the phase list)
        assert len(spec.spectra["noise"].columns) == len(old_freqs)

    def test_network_average_all_masked(self):
        """Every channel below SNR threshold -> all-NaN average, silently
        (no empty-slice RuntimeWarning)."""
        import warnings

        from seismic_bpmf_tpu.source.spectrum import Spectrum

        spec = Spectrum()
        freqs = np.linspace(1.0, 10.0, 16)
        spec.spectra["p"] = pd.DataFrame(
            np.ones((3, 16)), index=["A", "B", "C"], columns=freqs
        )
        spec.snr["p"] = pd.DataFrame(
            np.zeros((3, 16)), index=["A", "B", "C"], columns=freqs
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            avg = spec.compute_network_average_spectrum(
                "p", snr_threshold=3.0
            )
        assert avg.isna().all()

    def test_fit_below_fc_gate(self, rng):
        """A spectrum with no valid points below the corner frequency is
        rejected by the plateau gate."""
        from seismic_bpmf_tpu.source.spectrum import Spectrum, brune

        freqs = np.linspace(0.5, 12.0, 40)
        spec = Spectrum()
        spec.average_spectrum = pd.Series(
            brune(freqs, 1e13, 4.0), index=freqs
        )
        out = spec.fit_average_spectrum(
            model="brune", min_fraction_valid_points_below_fc=0.99
        )
        assert out is None and spec.fit_success is False

    def test_moment_magnitude_workflow(self, rng):
        """A synthetic event with a known moment-rate pulse gives a finite
        Mw through the full chain."""
        from seismic_bpmf_tpu.data import Network
        from seismic_bpmf_tpu.data.events import Event
        from seismic_bpmf_tpu.data.stream import Stream, Trace
        from seismic_bpmf_tpu.source import compute_moment_magnitude

        md = pd.DataFrame({
            "stations": ["ST1", "ST2", "ST3"],
            "networks": ["XX"] * 3,
            "latitude": [40.1, 40.2, 40.3],
            "longitude": [30.1, 30.2, 30.3],
            "elevation_m": [0.0] * 3,
        })
        net = Network.from_dataframe(md)
        sr = 25.0
        ev = Event(
            "2012-07-26T01:00:00",
            np.array([[1.0, 2.0], [1.2, 2.4], [1.4, 2.8]], np.float32),
            ["ST1", "ST2", "ST3"], ["P", "S"],
            latitude=40.2, longitude=30.2, depth=8.0, sampling_rate=sr,
        )
        ev.set_aux_data({"offset_P": 1.0, "offset_S": 4.0})
        ev.traces = Stream()
        n = 500
        for sta in ev.stations:
            for cp in "NEZ":
                x = 1e-6 * rng.normal(size=n).astype(np.float32)
                x[150:200] += 1e-4 * np.hanning(50)
                ev.traces += Trace(x, station=sta, channel=f"HH{cp}",
                                   sampling_rate=sr)
        ev.duration = n / sr
        spec = compute_moment_magnitude(ev, net, snr_threshold=1.5)
        # fit may or may not converge on synthetic noise, but the chain must
        # run end to end and produce finite spectra
        assert "p" in spec.spectra and "s" in spec.spectra
        assert np.isfinite(spec.spectra["s"].values).all()


class TestTraining:
    def test_train_phasenet_on_synthetic(self, rng):
        from seismic_bpmf_tpu.models import PhaseNet, train_phasenet
        from seismic_bpmf_tpu.models.training import windows_from_events

        # direct array training path (tiny model, tiny windows)
        n, window = 16, 256
        x = rng.normal(size=(n, window, 3)).astype(np.float32)
        picks = np.stack(
            [rng.uniform(40, 80, n), rng.uniform(120, 200, n)], axis=1
        ).astype(np.float32)
        model, variables, losses = train_phasenet(
            x, picks, n_epochs=3, batch_size=8,
            model=PhaseNet(depth=3, filters_root=4), verbose=False,
        )
        assert losses[-1] < losses[0]

    def test_windows_from_events(self, rng):
        from seismic_bpmf_tpu.data.events import Event
        from seismic_bpmf_tpu.data.stream import Stream, Trace
        from seismic_bpmf_tpu.models.training import windows_from_events

        ev = Event(
            "2012-07-26T01:00:00",
            np.array([[1.0, 2.0]], np.float32),
            ["ST1"], ["P", "S"], sampling_rate=100.0,
        )
        ev.traces = Stream()
        for cp in "NEZ":
            ev.traces += Trace(rng.normal(size=6000).astype(np.float32),
                               station="ST1", channel=f"HH{cp}",
                               sampling_rate=100.0)
        ev.duration = 60.0
        ev.picks = pd.DataFrame(
            {"P_picks": [1500.0], "S_picks": [2500.0]},
            index=pd.Index(["ST1"], name="stations"),
        )
        x, picks = windows_from_events([ev], window=3001)
        assert x.shape == (1, 3001, 3)
        assert picks.shape == (1, 2)
        # picks fall inside the window
        assert 0 <= picks[0, 0] < 3001


class TestCheckpoint:
    def test_variables_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        from seismic_bpmf_tpu.models import (
            init_phasenet, save_variables, load_variables,
        )

        model, variables = init_phasenet(window=401)
        path = save_variables(str(tmp_path / "ckpt"), variables)
        restored = load_variables(path, target=variables)
        x = jnp.ones((2, 401, 3), jnp.float32)
        a = model.apply(variables, x, train=False)
        b = model.apply(restored, x, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0)

    def test_train_state_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import optax
        from seismic_bpmf_tpu.models import (
            init_phasenet, save_train_state, load_train_state,
        )

        model, variables = init_phasenet(window=401)
        opt = optax.adam(1e-3)
        opt_state = opt.init(variables["params"])
        path = save_train_state(
            str(tmp_path / "state"), variables["params"],
            variables["batch_stats"], opt_state, step=7,
        )
        target = {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
            "opt_state": opt_state,
            "step": np.int64(0),
        }
        params, stats, opt_state2, step = load_train_state(path, target=target)
        assert step == 7
        chex_eq = jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: bool(jnp.array_equal(a, b)),
                variables["params"], params,
            )
        )
        assert chex_eq
        leaves1 = jax.tree_util.tree_leaves(opt_state)
        leaves2 = jax.tree_util.tree_leaves(opt_state2)
        assert len(leaves1) == len(leaves2)


class TestDeviceSliding:
    def test_device_matches_host_path(self):
        import numpy as np

        from seismic_bpmf_tpu.models import init_phasenet
        from seismic_bpmf_tpu.models.phasenet import (
            phasenet_probas_device,
            sliding_window_probas,
        )

        rng = np.random.default_rng(0)
        model, variables = init_phasenet(window=401)
        x = rng.normal(size=(2, 3, 1500)).astype(np.float32)
        host = sliding_window_probas(model, variables, x, window=401,
                                     norm_window=400)
        dev = np.asarray(phasenet_probas_device(
            model, variables, x, window=401, norm_window=400))
        assert dev.shape == host.shape == (2, 3, 1500)
        # normalization differs slightly (np.interp vs device interp);
        # probabilities must agree closely
        np.testing.assert_allclose(dev, host, atol=2e-3)
