"""Pallas kernel parity vs NumPy oracles (interpreter mode on CPU)."""

import numpy as np
import pytest

from seismic_bpmf_tpu.ops import reference as ref
from seismic_bpmf_tpu.ops.pallas_bp import beamform_pallas
from seismic_bpmf_tpu.ops.pallas_mf import matched_filter_pallas

# interpret-mode kernel parity is the slow half of the suite (~3 min);
# run the fast dev loop with `-m "not slow"` — the default run (and the
# driver's) still includes everything, 0 skips
pytestmark = pytest.mark.slow


class TestPallasMatchedFilter:
    def test_parity(self, rng):
        n_tp, n_sta, n_comp, L, n_samp = 5, 4, 3, 40, 3000
        data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
        tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
        mv = rng.integers(0, 50, size=(n_tp, n_sta, n_comp)).astype(np.int32)
        w = rng.uniform(0.1, 1, size=(n_tp, n_sta, n_comp)).astype(np.float32)
        w /= w.sum(axis=(1, 2), keepdims=True)
        want = ref.matched_filter(tp, mv, w, data, step=1)
        got = np.asarray(
            matched_filter_pallas(tp, mv, w, data, step=1, lag_block=512,
                                  interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_dense_high_matches_predicated(self, rng):
        """'high' dense variant (functional accumulation, no predication
        scratch) equals the predicated kernel to summation-order noise and
        the oracle to the precision-ladder tolerance."""
        from seismic_bpmf_tpu.ops.pallas_mf import PallasMatchedFilterPlan

        n_tp, n_sta, n_comp, L, n_samp = 5, 3, 2, 40, 3000
        data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
        tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
        mv = rng.integers(-30, 200, size=(n_tp, n_sta, n_comp)).astype(
            np.int32
        )
        w = rng.uniform(0.1, 1, size=(n_tp, n_sta, n_comp)).astype(
            np.float32
        )
        w /= w.sum(axis=(1, 2), keepdims=True)
        w[0, 1] = 0.0
        want = ref.matched_filter(tp, mv, w, data)
        ccs = {}
        for dense in (False, True):
            plan = PallasMatchedFilterPlan(
                tp, mv, w, n_samp, lag_block=512, precision="high",
                interpret=True, dense=dense,
            )
            ccs[dense] = np.asarray(plan(plan.pad_data(data)))
            np.testing.assert_allclose(ccs[dense], want, atol=5e-6)
        np.testing.assert_allclose(ccs[True], ccs[False], atol=1e-6)
        # non-split ('highest') kernel: dense and predicated agree exactly
        # with the bit-parity path
        for dense in (False, True):
            plan = PallasMatchedFilterPlan(
                tp, mv, w, n_samp, lag_block=512, precision="highest",
                interpret=True, dense=dense,
            )
            got = np.asarray(plan(plan.pad_data(data)))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_gather_ysel_matches_oracle(self, rng):
        """'gather' normalization select (per-template dynamic y-row
        slices instead of one-hot matmuls) equals the oracle at every
        precision rung, dense and predicated, incl. negative moveouts
        and a dead channel."""
        from seismic_bpmf_tpu.ops.pallas_mf import PallasMatchedFilterPlan

        n_tp, n_sta, n_comp, L, n_samp = 5, 3, 2, 40, 2000
        data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
        tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
        mv = rng.integers(-30, 200, size=(n_tp, n_sta, n_comp)).astype(
            np.int32
        )
        w = rng.uniform(0.1, 1, size=(n_tp, n_sta, n_comp)).astype(
            np.float32
        )
        w /= w.sum(axis=(1, 2), keepdims=True)
        w[0, 1] = 0.0
        want = ref.matched_filter(tp, mv, w, data)
        for prec, tol in (("highest", 1e-5), ("high", 5e-6)):
            for dense in (False, True):
                plan = PallasMatchedFilterPlan(
                    tp, mv, w, n_samp, lag_block=512, precision=prec,
                    interpret=True, dense=dense, ysel="gather",
                )
                got = np.asarray(plan(plan.pad_data(data)))
                np.testing.assert_allclose(got, want, rtol=1e-4, atol=tol)

    def test_bf16_day_upload_is_f32_with_bf16_values(self, rng):
        """pad_data(dtype='bfloat16') ships 2-byte samples and casts back
        on device: the result must be a normal f32 padded layout holding
        exactly bf16-rounded values (the screen campaign path)."""
        import ml_dtypes

        from seismic_bpmf_tpu.ops.pallas_mf import PallasMatchedFilterPlan

        n_tp, n_sta, n_comp, L, n_samp = 2, 2, 2, 32, 1500
        tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
        mv = rng.integers(0, 60, size=(n_tp, n_sta, n_comp)).astype(
            np.int32
        )
        w = np.full((n_tp, n_sta, n_comp), 0.25, np.float32)
        data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
        plan = PallasMatchedFilterPlan(
            tp, mv, w, n_samp, lag_block=512, interpret=True,
        )
        pad32 = np.asarray(plan.pad_data(data))
        pad16 = np.asarray(plan.pad_data(data, dtype="bfloat16"))
        assert pad16.dtype == np.float32
        assert pad16.shape == pad32.shape
        want = data.reshape(-1, n_samp).astype(ml_dtypes.bfloat16).astype(
            np.float32
        )
        got = pad16[: n_sta * n_comp,
                    plan.pad_left : plan.pad_left + n_samp]
        np.testing.assert_array_equal(got, want)
        # and the kernel still runs on it
        cc = np.asarray(plan(plan.pad_data(data, dtype="bfloat16")))
        cc32 = np.asarray(plan(plan.pad_data(data)))
        np.testing.assert_allclose(cc, cc32, atol=5e-3)

    def test_insufficient_overrides_fail_loud(self, rng):
        """Explicit pad_left / max_moveout overrides too small for the
        bank must raise, never clamp: a clamped row would wrap the
        filter placement (matmul) or gather the wrong normalization
        window (gather)."""
        import pytest

        from seismic_bpmf_tpu.ops.pallas_mf import PallasMatchedFilterPlan

        n_tp, n_sta, n_comp, L, n_samp = 3, 2, 2, 32, 1500
        tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
        w = np.full((n_tp, n_sta, n_comp), 0.25, np.float32)
        mv = rng.integers(-30, 60, size=(n_tp, n_sta, n_comp)).astype(
            np.int32
        )
        mv[0, 0, 0] = -30
        for ysel in ("matmul", "gather"):
            with pytest.raises(ValueError, match="pad_left"):
                PallasMatchedFilterPlan(
                    tp, mv, w, n_samp, lag_block=512, interpret=True,
                    pad_left=10, ysel=ysel,  # bank needs >= 30
                )
        mv_pos = rng.integers(0, 200, size=(n_tp, n_sta, n_comp)).astype(
            np.int32
        )
        mv_pos[0, 0, 0] = 199
        with pytest.raises(ValueError, match="max_moveout"):
            PallasMatchedFilterPlan(
                tp, mv_pos, w, n_samp, lag_block=512, interpret=True,
                max_moveout=64, ysel="gather",
            )

    def test_diag_modes_run(self, rng):
        """Stage-removal diagnostics (hardware cost attribution) produce
        finite output of the right shape; values are intentionally wrong."""
        from seismic_bpmf_tpu.ops.pallas_mf import PallasMatchedFilterPlan

        n_tp, n_sta, n_comp, L, n_samp = 3, 2, 2, 32, 1500
        data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
        tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
        mv = rng.integers(0, 60, size=(n_tp, n_sta, n_comp)).astype(np.int32)
        w = np.full((n_tp, n_sta, n_comp), 0.25, np.float32)
        for diag in ("noroll", "nonorm", "nocorr", "noysel", "nomask"):
            plan = PallasMatchedFilterPlan(
                tp, mv, w, n_samp, lag_block=512, precision="high",
                interpret=True, diag=diag,
            )
            out = np.asarray(plan(plan.pad_data(data)))
            assert out.shape == (n_tp, n_samp - L + 1)
            assert np.isfinite(out).all()

    def test_step(self, rng):
        n_tp, n_sta, n_comp, L, n_samp = 3, 3, 3, 32, 2000
        data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
        tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
        mv = rng.integers(0, 30, size=(n_tp, n_sta, n_comp)).astype(np.int32)
        w = np.full((n_tp, n_sta, n_comp), 1.0 / 9, np.float32)
        want = ref.matched_filter(tp, mv, w, data, step=4)
        got = np.asarray(
            matched_filter_pallas(tp, mv, w, data, step=4, lag_block=512,
                                  interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_dead_channel(self, rng):
        n_tp, n_sta, n_comp, L, n_samp = 2, 3, 3, 32, 1500
        data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
        data[0, 0] = 0.0
        tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
        tp[:, 1, 1] = 0.0  # dead template channel
        mv = rng.integers(0, 30, size=(n_tp, n_sta, n_comp)).astype(np.int32)
        w = np.full((n_tp, n_sta, n_comp), 1.0 / 9, np.float32)
        want = ref.matched_filter(tp, mv, w, data)
        got = np.asarray(
            matched_filter_pallas(tp, mv, w, data, lag_block=512,
                                  interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestPallasBeamform:
    def _problem(self, rng, n_src=29, n_samp=700, max_mv=60):
        n_sta, n_comp, n_ph = 5, 3, 2
        feats = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
        mv = rng.integers(0, max_mv, size=(n_src, n_sta, n_ph)).astype(
            np.int32
        )
        w_ph = np.zeros((n_sta, n_comp, n_ph), np.float32)
        w_ph[:, 2, 0] = 1.0
        w_ph[:, :2, 1] = 1.0
        w_src = rng.uniform(0.2, 1.0, size=(n_src, n_sta)).astype(np.float32)
        return feats, mv, w_ph, w_src

    @pytest.mark.parametrize("oob", ["strict", "flexible"])
    def test_reduce_none(self, rng, oob):
        feats, mv, w_ph, w_src = self._problem(rng)
        want = ref.beamform(feats, mv, w_ph, w_src, reduce="none",
                            out_of_bounds=oob)
        got = np.asarray(
            beamform_pallas(feats, mv, w_ph, w_src, reduce="none",
                            out_of_bounds=oob, time_block=256, src_block=16,
                            interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_reduce_max(self, rng):
        feats, mv, w_ph, w_src = self._problem(rng)
        want_v, want_i = ref.beamform(feats, mv, w_ph, w_src, reduce="max")
        got_v, got_i = beamform_pallas(
            feats, mv, w_ph, w_src, reduce="max", time_block=256,
            src_block=16, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got_v), want_v, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(got_i), want_i)

    @pytest.mark.parametrize("prec,tol", [("high", 5e-4), ("default", 5e-2)])
    def test_precision_ladder(self, rng, prec, tol):
        """bf16 ladder modes: exact one-hot selection, bf16-split data,
        VPU weights.  'high' keeps ~1e-5 absolute error on O(1) beams;
        'default' is a single bf16 pass (~2e-3 relative)."""
        feats, mv, w_ph, w_src = self._problem(rng)
        want_v, want_i = ref.beamform(feats, mv, w_ph, w_src, reduce="max")
        got_v, got_i = beamform_pallas(
            feats, mv, w_ph, w_src, reduce="max", time_block=256,
            src_block=16, interpret=True, precision=prec,
        )
        np.testing.assert_allclose(np.asarray(got_v), want_v, atol=tol)
        # argmax may legitimately flip only where runner-up beams are
        # within the value tolerance
        agree = np.mean(np.asarray(got_i) == want_i)
        assert agree > 0.98
        want_b = ref.beamform(feats, mv, w_ph, w_src, reduce="none")
        got_b = np.asarray(
            beamform_pallas(feats, mv, w_ph, w_src, reduce="none",
                            time_block=256, src_block=16, interpret=True,
                            precision=prec)
        )
        np.testing.assert_allclose(got_b, want_b, atol=tol)

    def test_chunked_plan_identical(self, rng):
        """The time-chunked plan path must be bit-identical to the single
        call (absolute offsets keep strict-bounds masking global)."""
        from seismic_bpmf_tpu.ops.pallas_bp import PallasBeamformPlan

        feats, mv, w_ph, w_src = self._problem(rng, n_samp=1500)
        plan = PallasBeamformPlan(
            mv, w_ph, w_src, feats.shape[-1], reduce="max",
            time_block=256, src_block=16, interpret=True, precision="high",
        )
        g = plan.fold_and_pad(feats)
        v1, i1 = plan.call_folded(g)
        v2, i2 = plan.call_folded_chunked(g, 3)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_diag_modes_run(self, rng):
        """BP stage-removal diagnostics compile and produce finite output
        (values intentionally wrong; timing only)."""
        from seismic_bpmf_tpu.ops.pallas_bp import PallasBeamformPlan

        feats, mv, w_ph, w_src = self._problem(rng)
        n_samp = feats.shape[-1]
        for diag in ("noroll", "noonehot", "nosplit", "nomask"):
            plan = PallasBeamformPlan(
                mv, w_ph, w_src, n_samp, interpret=True, precision="high",
                diag=diag,
            )
            v, i = plan(feats)
            assert np.isfinite(np.asarray(v)).all(), diag

    @pytest.mark.parametrize("prec", ["highest", "high"])
    def test_no_hoist_narrowed_hankel(self, rng, prec):
        """The large-network fallback (per-block narrowed, nq-predicated
        Hankel rebuild) must match the hoisted path exactly.  Sparse
        source weights exercise the dead (sp, block) skip."""
        feats, mv, w_ph, w_src = self._problem(rng, n_src=40, max_mv=300)
        w_src[:, ::2] = 0.0  # half the stations dead per source
        want_v, want_i = ref.beamform(feats, mv, w_ph, w_src, reduce="max")
        got_v, got_i = beamform_pallas(
            feats, mv, w_ph, w_src, reduce="max", time_block=256,
            src_block=16, interpret=True, precision=prec,
            hoist_hankel=False,
        )
        tol = 1e-5 if prec == "highest" else 5e-4
        np.testing.assert_allclose(np.asarray(got_v), want_v, atol=tol)
        assert np.mean(np.asarray(got_i) == want_i) > 0.98

    def test_auto_chunking(self, rng, monkeypatch):
        """call_folded transparently chunks big problems (and stays
        bit-identical to the unchunked kernel)."""
        from seismic_bpmf_tpu.ops.pallas_bp import PallasBeamformPlan

        feats, mv, w_ph, w_src = self._problem(rng, n_samp=1500)
        plan = PallasBeamformPlan(
            mv, w_ph, w_src, feats.shape[-1], reduce="max",
            time_block=256, src_block=16, interpret=True,
        )
        g = plan.fold_and_pad(feats)
        v1, i1 = plan.call_folded(g)  # single call (small problem)
        monkeypatch.setattr(PallasBeamformPlan, "CHUNK_POINTS", 10_000)
        v2, i2 = plan.call_folded(g)  # now auto-chunks
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


class TestPallasNegativeMoveouts:
    def test_negative_moveouts_parity(self, rng):
        """Inter-template CC uses relative moveouts that can be negative;
        the wrapper's pad_left path must keep oracle parity."""
        n_tp, n_sta, n_comp, L, n_samp = 3, 3, 3, 24, 1200
        data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
        tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
        mv = rng.integers(-40, 40, size=(n_tp, n_sta, n_comp)).astype(
            np.int32
        )
        w = np.full((n_tp, n_sta, n_comp), 1.0 / 9, np.float32)
        want = ref.matched_filter(tp, mv, w, data)
        got = np.asarray(
            matched_filter_pallas(tp, mv, w, data, lag_block=256,
                                  interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
