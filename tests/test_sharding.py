"""Sharded == unsharded on a virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

# the 8-device-mesh parity set is the slow half of the suite; run the
# fast dev loop with `-m "not slow"` — the default run still includes it
pytestmark = pytest.mark.slow

from seismic_bpmf_tpu.ops import beamform, matched_filter
from seismic_bpmf_tpu.parallel import (
    beamform_sharded,
    make_mesh,
    matched_filter_sharded,
)


def _bp_problem(rng, n_src=29, n_sta=5, n_comp=3, n_ph=2, n_samp=512,
                max_mv=40):
    features = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
    moveouts = rng.integers(0, max_mv, size=(n_src, n_sta, n_ph)).astype(
        np.int32
    )
    w_ph = np.zeros((n_sta, n_comp, n_ph), np.float32)
    w_ph[:, 2, 0] = 1.0
    w_ph[:, :2, 1] = 1.0
    w_src = rng.uniform(0.2, 1.0, size=(n_src, n_sta)).astype(np.float32)
    return features, moveouts, w_ph, w_src


def _mf_problem(rng, n_tp=5, n_sta=4, n_comp=3, L=32, n_samp=640, max_mv=30):
    data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
    moveouts = rng.integers(0, max_mv, size=(n_tp, n_sta, n_comp)).astype(
        np.int32
    )
    templates = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
    weights = rng.uniform(0.1, 1.0, size=(n_tp, n_sta, n_comp)).astype(
        np.float32
    )
    weights /= weights.sum(axis=(1, 2), keepdims=True)
    return templates, moveouts, weights, data


def test_device_count():
    assert len(jax.devices()) == 8, "tests need the virtual 8-device CPU mesh"


class TestMatchedFilterSharded:
    @pytest.mark.parametrize(
        "mesh_shape", [{"tp": 8, "time": 1}, {"tp": 1, "time": 8},
                       {"tp": 2, "time": 4}, {"tp": 4, "time": 2}]
    )
    def test_matches_unsharded(self, rng, mesh_shape):
        tp, mv, w, data = _mf_problem(rng)
        mesh = make_mesh(mesh_shape)
        want = np.asarray(matched_filter(tp, mv, w, data, n_corr_block=128))
        got = np.asarray(
            matched_filter_sharded(tp, mv, w, data, mesh)
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_step_decimation(self, rng):
        tp, mv, w, data = _mf_problem(rng)
        mesh = make_mesh({"tp": 2, "time": 4})
        want = np.asarray(
            matched_filter(tp, mv, w, data, step=4, n_corr_block=64)
        )
        got = np.asarray(matched_filter_sharded(tp, mv, w, data, mesh, step=4))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestBeamformSharded:
    @pytest.mark.parametrize(
        "mesh_shape", [{"src": 8, "time": 1}, {"src": 1, "time": 8},
                       {"src": 4, "time": 2}]
    )
    @pytest.mark.parametrize("engine", ["onehot", "gather"])
    def test_reduce_max(self, rng, mesh_shape, engine):
        feats, mv, w_ph, w_src = _bp_problem(rng)
        mesh = make_mesh(mesh_shape)
        want_max, want_src = beamform(
            feats, mv, w_ph, w_src, reduce="max", engine=engine,
            time_block=128, src_block=8,
        )
        got_max, got_src = beamform_sharded(
            feats, mv, w_ph, w_src, mesh, reduce="max", engine=engine,
            time_block=64, src_block=4,
        )
        np.testing.assert_allclose(
            np.asarray(got_max), np.asarray(want_max), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(got_src), np.asarray(want_src)
        )

    @pytest.mark.parametrize("oob", ["strict", "flexible"])
    def test_reduce_none(self, rng, oob):
        feats, mv, w_ph, w_src = _bp_problem(rng, n_src=17)
        mesh = make_mesh({"src": 2, "time": 4})
        want = np.asarray(
            beamform(feats, mv, w_ph, w_src, reduce="none",
                     out_of_bounds=oob, time_block=128, src_block=8)
        )
        got = np.asarray(
            beamform_sharded(feats, mv, w_ph, w_src, mesh, reduce="none",
                             out_of_bounds=oob, time_block=64, src_block=4)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestMatchedFilterShardedPallas:
    @pytest.mark.parametrize(
        "mesh_shape", [{"tp": 2, "time": 4}, {"tp": 1, "time": 8},
                       {"tp": 8, "time": 1}]
    )
    def test_matches_unsharded_pallas(self, rng, mesh_shape):
        from seismic_bpmf_tpu.ops.pallas_mf import matched_filter_pallas
        from seismic_bpmf_tpu.parallel import matched_filter_sharded_pallas

        tp, mv, w, data = _mf_problem(rng, n_samp=2048)
        mesh = make_mesh(mesh_shape)
        want = np.asarray(
            matched_filter_pallas(tp, mv, w, data, lag_block=128,
                                  interpret=True)
        )
        got = np.asarray(
            matched_filter_sharded_pallas(
                tp, mv, w, data, mesh, lag_block=128, interpret=True
            )
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_precision_ladder_and_negative_moveouts(self, rng):
        """'high' (bf16-split, 3-pass) sharded scan stays within ~2e-5 of
        the oracle, with negative template moveouts exercising the
        left-halo path in both sharded wrappers."""
        from seismic_bpmf_tpu.ops.reference import matched_filter as mf_ref
        from seismic_bpmf_tpu.parallel import (
            matched_filter_sharded,
            matched_filter_sharded_pallas,
        )

        n_tp, n_sta, n_comp, L, n_samp = 8, 4, 3, 40, 4096
        data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
        tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
        mv = rng.integers(-30, 60, size=(n_tp, n_sta, n_comp)).astype(
            np.int32
        )
        w = np.full((n_tp, n_sta, n_comp), 1.0 / (n_sta * n_comp),
                    np.float32)
        ref = mf_ref(tp, mv, w, data)
        mesh = make_mesh({"tp": 2, "time": 4})
        for prec, tol in (("highest", 5e-6), ("high", 2e-5)):
            got = np.asarray(matched_filter_sharded_pallas(
                tp, mv, w, data, mesh, lag_block=512, interpret=True,
                precision=prec,
            ))
            np.testing.assert_allclose(got, ref, atol=tol)
        got_xla = np.asarray(
            matched_filter_sharded(tp, mv, w, data, mesh)
        )
        np.testing.assert_allclose(got_xla, ref, atol=5e-6)


class TestBeamformShardedPallas:
    @pytest.mark.parametrize(
        "mesh_shape", [{"src": 2, "time": 4}, {"src": 1, "time": 8},
                       {"src": 4, "time": 2}]
    )
    def test_reduce_max_matches_unsharded(self, rng, mesh_shape):
        from seismic_bpmf_tpu.ops.pallas_bp import beamform_pallas
        from seismic_bpmf_tpu.parallel import beamform_sharded_pallas

        feats, mv, w_ph, w_src = _bp_problem(rng, n_samp=2048)
        mesh = make_mesh(mesh_shape)
        want_v, want_i = beamform_pallas(
            feats, mv, w_ph, w_src, reduce="max", time_block=256,
            src_block=128, interpret=True,
        )
        got_v, got_i = beamform_sharded_pallas(
            feats, mv, w_ph, w_src, mesh, reduce="max", time_block=256,
            src_block=128, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got_v), np.asarray(want_v), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))

    def test_reduce_none_matches_unsharded(self, rng):
        from seismic_bpmf_tpu.ops.pallas_bp import beamform_pallas
        from seismic_bpmf_tpu.parallel import beamform_sharded_pallas

        feats, mv, w_ph, w_src = _bp_problem(rng, n_src=17, n_samp=2048)
        mesh = make_mesh({"src": 2, "time": 4})
        want = np.asarray(
            beamform_pallas(feats, mv, w_ph, w_src, reduce="none",
                            time_block=256, src_block=128, interpret=True)
        )
        got = np.asarray(
            beamform_sharded_pallas(feats, mv, w_ph, w_src, mesh,
                                    reduce="none", time_block=256,
                                    src_block=128, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_precision_ladder_sharded(self, rng):
        """Sharded 'high' beamform matches the unsharded ladder kernel
        bit-for-bit (same kernel per shard + exact collectives)."""
        from seismic_bpmf_tpu.ops.pallas_bp import beamform_pallas
        from seismic_bpmf_tpu.parallel import beamform_sharded_pallas

        feats, mv, w_ph, w_src = _bp_problem(rng, n_samp=2048)
        mesh = make_mesh({"src": 2, "time": 4})
        want_v, want_i = beamform_pallas(
            feats, mv, w_ph, w_src, reduce="max", time_block=256,
            src_block=128, interpret=True, precision="high",
        )
        got_v, got_i = beamform_sharded_pallas(
            feats, mv, w_ph, w_src, mesh, reduce="max", time_block=256,
            src_block=128, interpret=True, precision="high",
        )
        np.testing.assert_allclose(
            np.asarray(got_v), np.asarray(want_v), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
