"""Parity tests: JAX device kernels vs the NumPy oracles.

Synthetic data design: impulse trains with known moveouts so beam/CC peaks
are analytically known, plus dense random noise for general parity.
"""

import numpy as np
import pytest

from seismic_bpmf_tpu.ops import reference as ref
from seismic_bpmf_tpu.ops import (
    beamform,
    bp_detection_threshold,
    envelope,
    kurtosis,
    matched_filter,
    saturated_envelopes,
    time_dependent_threshold,
)


def _random_bp_problem(rng, n_src=37, n_sta=7, n_comp=3, n_ph=2, n_samp=400,
                       max_mv=60):
    features = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
    moveouts = rng.integers(0, max_mv, size=(n_src, n_sta, n_ph)).astype(
        np.int32
    )
    w_ph = np.zeros((n_sta, n_comp, n_ph), np.float32)
    w_ph[:, 2, 0] = 1.0  # P on vertical
    w_ph[:, :2, 1] = 1.0  # S on horizontals
    w_src = rng.uniform(0.2, 1.0, size=(n_src, n_sta)).astype(np.float32)
    w_src[rng.random(size=w_src.shape) < 0.2] = 0.0
    return features, moveouts, w_ph, w_src


class TestBeamform:
    @pytest.mark.parametrize("engine", ["onehot", "gather"])
    @pytest.mark.parametrize("oob", ["strict", "flexible"])
    def test_reduce_none_parity(self, rng, engine, oob):
        feats, mv, w_ph, w_src = _random_bp_problem(rng)
        want = ref.beamform(feats, mv, w_ph, w_src, reduce="none",
                            out_of_bounds=oob)
        got = np.asarray(
            beamform(feats, mv, w_ph, w_src, reduce="none",
                     out_of_bounds=oob, engine=engine,
                     time_block=128, src_block=16)
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("engine", ["onehot", "gather"])
    def test_reduce_max_parity(self, rng, engine):
        feats, mv, w_ph, w_src = _random_bp_problem(rng)
        want_max, want_src = ref.beamform(
            feats, mv, w_ph, w_src, reduce="max", out_of_bounds="strict"
        )
        got_max, got_src = beamform(
            feats, mv, w_ph, w_src, reduce="max", out_of_bounds="strict",
            engine=engine, time_block=128, src_block=16,
        )
        got_max, got_src = np.asarray(got_max), np.asarray(got_src)
        np.testing.assert_allclose(got_max, want_max, rtol=2e-4, atol=2e-4)
        # argmax may differ where beams tie within tolerance; check values
        n_samp = feats.shape[-1]
        full = ref.beamform(feats, mv, w_ph, w_src, reduce="none",
                            out_of_bounds="strict")
        picked = full[got_src, np.arange(n_samp)]
        np.testing.assert_allclose(picked, want_max, rtol=2e-4, atol=2e-4)

    def test_impulse_train_peaks(self, rng):
        """An impulse inserted with the moveouts of source i must produce a
        beam maximum at the insertion time attributed to source i."""
        n_src, n_sta, n_ph = 11, 6, 2
        n_samp = 600
        mv = rng.integers(0, 80, size=(n_src, n_sta, n_ph)).astype(np.int32)
        # make source 4 distinctive
        feats = np.zeros((n_sta, 3, n_samp), np.float32)
        t0 = 150
        src = 4
        for s in range(n_sta):
            feats[s, 2, t0 + mv[src, s, 0]] = 1.0  # P on Z
            feats[s, 0, t0 + mv[src, s, 1]] = 1.0  # S on N
            feats[s, 1, t0 + mv[src, s, 1]] = 1.0  # S on E
        w_ph = np.zeros((n_sta, 3, n_ph), np.float32)
        w_ph[:, 2, 0] = 1.0
        w_ph[:, :2, 1] = 1.0
        w_src = np.ones((n_src, n_sta), np.float32)
        maxbeam, maxsrc = beamform(
            feats, mv, w_ph, w_src, reduce="max", engine="onehot",
            time_block=256, src_block=8,
        )
        maxbeam = np.asarray(maxbeam)
        assert int(np.argmax(maxbeam)) == t0
        assert int(np.asarray(maxsrc)[t0]) == src
        # peak value = n_sta * (1 P + 2 S impulses)
        np.testing.assert_allclose(maxbeam[t0], 3 * n_sta, rtol=1e-5)


class TestMatchedFilter:
    def _problem(self, rng, n_tp=5, n_sta=6, n_comp=3, L=40, n_samp=500):
        data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
        moveouts = rng.integers(0, 50, size=(n_tp, n_sta, n_comp)).astype(
            np.int32
        )
        templates = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(
            np.float32
        )
        weights = rng.uniform(0.0, 1.0, size=(n_tp, n_sta, n_comp)).astype(
            np.float32
        )
        weights /= weights.sum(axis=(1, 2), keepdims=True)
        return templates, moveouts, weights, data

    @pytest.mark.parametrize("step", [1, 2, 4])
    def test_network_sum_parity(self, rng, step):
        tp, mv, w, data = self._problem(rng)
        want = ref.matched_filter(tp, mv, w, data, step=step)
        got = np.asarray(
            matched_filter(tp, mv, w, data, step=step, n_corr_block=64)
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_per_channel_parity(self, rng):
        tp, mv, w, data = self._problem(rng, n_tp=3, n_samp=300)
        want = ref.matched_filter(tp, mv, w, data, step=1, network_sum=False)
        got = np.asarray(
            matched_filter(tp, mv, w, data, step=1, network_sum=False,
                           n_corr_block=64)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_self_detection(self, rng):
        """Templates cut from the data at known times must produce CC ~ 1."""
        tp, mv, w, data = self._problem(rng, n_tp=2, L=30, n_samp=400)
        t_event = 123
        n_tp, n_sta, n_comp, L = tp.shape
        for t in range(n_tp):
            for s in range(n_sta):
                for c in range(n_comp):
                    st = t_event + mv[t, s, c]
                    tp[t, s, c] = data[s, c, st : st + L]
        cc = np.asarray(matched_filter(tp, mv, w, data, n_corr_block=128))
        np.testing.assert_allclose(cc[:, t_event], 1.0, atol=1e-5)
        assert np.all(cc[:, t_event] >= cc.max(axis=1) - 1e-6)

    def test_zero_variance_window(self, rng):
        tp, mv, w, data = self._problem(rng, n_tp=2, n_samp=300)
        data[0, 0, :] = 0.0  # dead channel -> cc contribution 0
        want = ref.matched_filter(tp, mv, w, data)
        got = np.asarray(matched_filter(tp, mv, w, data, n_corr_block=64))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestThresholds:
    def test_rms_parity(self, rng):
        n = 5000
        cc = np.abs(rng.normal(size=n)).astype(np.float32) * 0.05
        cc[1000:1100] = 0.0  # a gap
        gauss = rng.normal(size=500).astype(np.float32)
        want = ref.time_dependent_threshold(
            cc, 600, 8.0, overlap=0.66, threshold_type="rms",
            white_noise=gauss,
        )
        got = np.asarray(
            time_dependent_threshold(
                cc, 600, 8.0, overlap=0.66, threshold_type="rms",
                white_noise=gauss,
            )
        )
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)

    def test_mad_parity(self, rng):
        n = 5000
        cc = np.abs(rng.normal(size=n)).astype(np.float32) * 0.05
        gauss = rng.normal(size=n).astype(np.float32)
        want = ref.time_dependent_threshold(
            cc, 600, 8.0, overlap=0.66, threshold_type="mad",
            white_noise=gauss,
        )
        got = np.asarray(
            time_dependent_threshold(
                cc, 600, 8.0, overlap=0.66, threshold_type="mad",
                white_noise=gauss,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_bp_threshold_parity(self, rng):
        n = 4000
        x = np.abs(rng.normal(size=n)).astype(np.float32)
        want = ref.bp_detection_threshold(x, window=500, overlap=0.75,
                                          num_dev=15.0)
        got = np.asarray(
            bp_detection_threshold(x, window=500, overlap=0.75, num_dev=15.0)
        )
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


class TestCharacteristicFunctions:
    def test_envelope_parity(self, rng):
        x = rng.normal(size=(3, 2, 1024)).astype(np.float32)
        want = ref.envelope(x)
        got = np.asarray(envelope(x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_saturated_envelopes(self, rng):
        x = rng.normal(size=(4, 3, 2048)).astype(np.float32)
        x[1, 2, :] = 0.0  # dead channel
        want_env, want_avail = ref.saturated_envelopes(x)
        got_env, got_avail = saturated_envelopes(x)
        np.testing.assert_allclose(
            np.asarray(got_env), want_env, rtol=1e-3, atol=1e-3
        )
        np.testing.assert_array_equal(np.asarray(got_avail), want_avail)

    def test_kurtosis_parity(self, rng):
        x = rng.normal(size=(2, 3, 600)).astype(np.float32)
        want = ref.kurtosis(x, 50)
        got = np.asarray(kurtosis(x, 50))
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


class TestHostScans:
    def test_select_cc_indexes_simple(self):
        cc = np.array([0, 1, 0, 5, 4, 0, 0, 9, 0, 2], np.float32)
        thr = np.full(10, 0.5, np.float32)
        sel = ref.select_cc_indexes(cc, thr, search_win=2)
        # 1 is cleared by 5; 4 is within 2 of 5; 9 wins over everything near
        assert list(np.flatnonzero(sel)) == [3, 7]

    def test_dedup_detection_indexes(self):
        cc = np.zeros(100, np.float32)
        cc[[10, 12, 40, 41, 80]] = [3.0, 5.0, 2.0, 1.0, 4.0]
        idx = np.array([10, 12, 40, 41, 80])
        kept = ref.dedup_detection_indexes(idx, cc, search_win=5)
        assert list(kept) == [12, 40, 80]

    def test_find_similar_sources(self, rng):
        n_src, n_sta = 30, 8
        mv = rng.uniform(0, 20, size=(n_src, n_sta)).astype(np.float32)
        mv[5] = mv[2] + 0.01  # source 5 redundant with 2
        mv[9] = mv[2] + 0.02  # source 9 redundant with 2
        lon = rng.uniform(30, 31, n_src).astype(np.float32)
        lat = rng.uniform(40, 41, n_src).astype(np.float32)
        cells_lon = np.linspace(30, 31, 3).astype(np.float32)
        cells_lat = np.linspace(40, 41, 3).astype(np.float32)
        red = ref.find_similar_sources(
            mv, lon, lat, cells_lon, cells_lat, threshold=0.1,
            method="smallest",
        )
        assert not red[2] and red[5] and red[9]
        red2 = ref.find_similar_sources(
            mv, lon, lat, cells_lon, cells_lat, threshold=0.1,
            method="closest",
        )
        assert not red2[2] and red2[5] and red2[9]


class TestBatchCandidates:
    def test_pack_guard_and_plan_cache_stability(self):
        """(1) f32 packing is refused for series >= 2^24 samples (indices
        would round to even values — wrong candidate lags); (2) the
        module-level rms plan cache is stable across white_noise=None
        calls (one plan + one tiled-fill upload per campaign geometry,
        not per day) and LRU-refreshes on hit."""
        import pytest

        from seismic_bpmf_tpu.ops.thresholds import (
            _RMS_PLAN_CACHE, RmsExtractionPlan, _rms_plan,
        )

        big = RmsExtractionPlan(2 ** 24, 45_000)
        assert not big.can_pack
        with pytest.raises(ValueError, match="2\\^24"):
            big.extract(np.zeros((2, 8)), np.ones(2), 8.0, pack=True)
        assert RmsExtractionPlan(2 ** 24 - 1, 45_000).can_pack

        _RMS_PLAN_CACHE.clear()
        a = _rms_plan(20_000, 600, 0.66, None, 64, 256)
        b = _rms_plan(20_000, 600, 0.66, None, 64, 256)
        assert a is b  # day 2 with default noise reuses day 1's plan
        c = _rms_plan(30_000, 600, 0.66, None, 64, 256)
        assert _rms_plan(20_000, 600, 0.66, None, 64, 256) is a
        # LRU: the re-hit 20k plan is most recent, 30k oldest
        assert list(_RMS_PLAN_CACHE.values())[-1] is a
        assert list(_RMS_PLAN_CACHE.values())[0] is c

    def test_matches_per_template_path(self):
        """batch_candidates == per-row time_dependent_threshold + top-k."""
        import jax.numpy as jnp

        from seismic_bpmf_tpu.ops.thresholds import (
            batch_candidates,
            detect_candidates,
        )

        rng = np.random.default_rng(3)
        n_tp, n = 5, 20000
        cc = rng.normal(size=(n_tp, n)).astype(np.float32) * 0.01
        # inject spikes so candidates exist
        for t in range(n_tp):
            cc[t, rng.integers(0, n, size=4)] += 0.5
        wn = rng.normal(size=500).astype(np.float32)
        caps = np.linspace(0.3, 0.8, n_tp).astype(np.float32)

        idx_b, ccv_b, thv_b, na_b, k_b, bh_b = (
            np.asarray(x) for x in batch_candidates(
                jnp.asarray(cc), caps, 600, 8.0, white_noise=wn, k=64,
            )
        )
        assert np.all(bh_b <= 256)  # two-stage bound holds here
        for t in range(n_tp):
            thr = time_dependent_threshold(
                cc[t], 600, 8.0, white_noise=wn
            )
            thr = np.minimum(np.asarray(thr), caps[t])
            idx, ccv, thv, na, kurto = detect_candidates(
                jnp.asarray(cc[t]), jnp.asarray(thr), k=64
            )
            assert int(na) == int(na_b[t])
            n_above = int(na)
            order_a = np.sort(np.asarray(idx)[:n_above])
            order_b = np.sort(idx_b[t][:n_above])
            np.testing.assert_array_equal(order_a, order_b)
            np.testing.assert_allclose(float(kurto), k_b[t], rtol=1e-5)

    def test_two_stage_extraction_exact_and_overflow_flag(self):
        """The two-stage block extraction returns exactly the
        above-threshold set while candidates span <= k_blocks blocks, and
        reports blocks_hit so callers can fall back when they don't."""
        import jax.numpy as jnp

        from seismic_bpmf_tpu.ops.thresholds import (
            CANDIDATE_BLOCK,
            _candidate_extract_kernel,
            _candidate_extract_two_stage,
        )

        rng = np.random.default_rng(11)
        n = 300 * CANDIDATE_BLOCK + 37  # non-multiple exercises padding
        cc = rng.normal(size=n).astype(np.float32) * 0.01
        thr = np.full(n, 0.3, np.float32)
        # clustered candidates: dense runs in a handful of blocks,
        # including one straddling a block boundary and one in the ragged
        # tail block
        spots = [5 * CANDIDATE_BLOCK + 10, 7 * CANDIDATE_BLOCK - 3,
                 200 * CANDIDATE_BLOCK + 100, n - 20]
        for s in spots:
            cc[s : s + 8] += 0.5 + 0.01 * rng.random(8).astype(np.float32)
        want = np.flatnonzero(cc > thr)

        out = _candidate_extract_two_stage(
            jnp.asarray(cc), jnp.asarray(thr), 64, 16
        )
        idx, ccv, thv, na, kurto, bh = (np.asarray(a) for a in out)
        assert int(na) == len(want)
        assert int(bh) <= 16
        np.testing.assert_array_equal(np.sort(idx[: int(na)]), want)
        np.testing.assert_allclose(
            np.sort(ccv[: int(na)]), np.sort(cc[want]), rtol=1e-6
        )
        # agreement with the one-stage kernel
        idx1, ccv1, thv1, na1, k1 = (
            np.asarray(a)
            for a in _candidate_extract_kernel(
                jnp.asarray(cc), jnp.asarray(thr), 64
            )
        )
        assert int(na1) == int(na)
        np.testing.assert_array_equal(
            np.sort(idx1[: int(na)]), np.sort(idx[: int(na)])
        )
        np.testing.assert_allclose(float(k1), float(kurto), rtol=1e-5)

        # scattered candidates in more blocks than k_blocks: flag trips
        cc2 = rng.normal(size=n).astype(np.float32) * 0.01
        blocks = rng.choice(n // CANDIDATE_BLOCK, size=40, replace=False)
        for b in blocks:
            cc2[b * CANDIDATE_BLOCK + 17] += 0.5
        out2 = _candidate_extract_two_stage(
            jnp.asarray(cc2), jnp.asarray(thr), 64, 16
        )
        assert int(np.asarray(out2[5])) == 40  # blocks_hit reported
        assert 40 > 16  # caller must fall back

    def test_two_stage_extraction_fuzz(self):
        """Randomized densities/cluster shapes: wherever the two-stage
        bounds hold, the candidate set equals the one-stage kernel's."""
        import jax.numpy as jnp

        from seismic_bpmf_tpu.ops.thresholds import (
            CANDIDATE_BLOCK,
            _candidate_extract_kernel,
            _candidate_extract_two_stage,
        )

        rng = np.random.default_rng(99)
        for trial in range(12):
            n = int(rng.integers(5_000, 120_000))
            cc = rng.normal(size=n).astype(np.float32) * 0.02
            thr = np.full(n, float(rng.uniform(0.2, 0.4)), np.float32)
            n_clusters = int(rng.integers(0, 12))
            for _ in range(n_clusters):
                at = int(rng.integers(0, n - 30))
                width = int(rng.integers(1, 30))
                cc[at:at + width] += rng.uniform(0.3, 0.8)
            k, k_blocks = 256, 16
            out2 = _candidate_extract_two_stage(
                jnp.asarray(cc), jnp.asarray(thr), k, k_blocks
            )
            na2, bh = int(np.asarray(out2[3])), int(np.asarray(out2[5]))
            want = np.flatnonzero(cc > thr)
            assert na2 == len(want)
            if bh > k_blocks or na2 > k:
                continue  # caller falls back; bounds honestly reported
            idx2 = np.sort(np.asarray(out2[0])[:na2])
            np.testing.assert_array_equal(idx2, want)
            out1 = _candidate_extract_kernel(
                jnp.asarray(cc), jnp.asarray(thr), min(k, n)
            )
            np.testing.assert_array_equal(
                idx2, np.sort(np.asarray(out1[0])[:na2])
            )

    def test_fused_matches_vmapped(self):
        """The fused rms kernel (block-sum thresholds, hierarchical
        narrowing) returns the same candidate set as the vmapped
        per-row composition, including zero-fill regions, mostly-zero
        rows, clustered runs and a ragged tail."""
        import jax.numpy as jnp

        from seismic_bpmf_tpu.ops.thresholds import batch_candidates

        rng = np.random.default_rng(7)
        n_tp, n = 6, 137_003  # not a multiple of the 512 extract block
        cc = rng.normal(size=(n_tp, n)).astype(np.float32) * 0.01
        cc[:, 5000:9000] = 0.0  # zero region exercises the fill algebra
        cc[2, :] = 0.0
        cc[2, 50000:50010] = 0.4  # mostly-zero row
        for t in range(n_tp):
            cc[t, rng.integers(100, n, size=5)] += 0.5
            s = int(rng.integers(1000, n - 100))
            cc[t, s : s + 20] += 0.45  # clustered run
        wn = rng.normal(size=500).astype(np.float32)
        caps = np.linspace(0.3, 0.9, n_tp).astype(np.float32)

        kw = dict(white_noise=wn, k=64, k_blocks=32, overlap=0.25,
                  margin=0.003)
        a = [np.asarray(x) for x in batch_candidates(
            jnp.asarray(cc), caps, 4096, 8.0, fused=True, **kw)]
        b = [np.asarray(x) for x in batch_candidates(
            jnp.asarray(cc), caps, 4096, 8.0, fused=False, **kw)]
        for t in range(n_tp):
            na = int(a[3][t])
            assert na == int(b[3][t])
            assert int(a[5][t]) == int(b[5][t])  # blocks_hit
            np.testing.assert_array_equal(
                np.sort(a[0][t][:na]), np.sort(b[0][t][:na])
            )
            np.testing.assert_allclose(  # thresholds to fp tolerance
                np.sort(a[2][t][:na]), np.sort(b[2][t][:na]),
                rtol=2e-5, atol=2e-6,
            )
            np.testing.assert_allclose(a[4][t], b[4][t], rtol=1e-3,
                                       atol=1e-4)

    def test_fused_level2_overflow_flag(self):
        """Candidates in <= k_blocks 512-blocks but > L2_KEEP 32-sample
        sub-blocks: the fused kernel must report past k_blocks so the
        caller's exact fallback triggers."""
        import jax.numpy as jnp

        from seismic_bpmf_tpu.ops.thresholds import (
            CANDIDATE_BLOCK,
            L2_KEEP,
            L2_SUB,
            batch_candidates,
        )

        rng = np.random.default_rng(13)
        n = 700 * CANDIDATE_BLOCK
        cc = rng.normal(size=(1, n)).astype(np.float32) * 0.01
        # 40 full blocks, every 32-sample sub-block hit: 640 sub-blocks.
        # Blocks are spread 16 apart so each 8-block threshold window
        # holds at most one (denser spikes would lift their own window's
        # rms threshold above the spike height).
        n_sub = CANDIDATE_BLOCK // L2_SUB
        hit_blocks = 40
        assert hit_blocks * n_sub > L2_KEEP
        for b in range(hit_blocks):
            for s in range(n_sub):
                cc[0, 16 * b * CANDIDATE_BLOCK + s * L2_SUB + 3] += 0.6
        wn = rng.normal(size=500).astype(np.float32)
        caps = np.full(1, 0.9, np.float32)
        k_blocks = 64  # level 1 holds (40 <= 64); level 2 overflows
        out = [np.asarray(x) for x in batch_candidates(
            jnp.asarray(cc), caps, 4096, 8.0, white_noise=wn,
            k=1024, k_blocks=k_blocks, overlap=0.25, fused=True)]
        assert int(out[5][0]) > k_blocks  # overflow visible to caller
        assert int(out[3][0]) == hit_blocks * n_sub  # n_above still exact

    def test_fused_tail_boundary_parity(self):
        """Peaks straddling the threshold tail clause (i >= n - shift,
        where the window index can jump by more than one): the fused
        kernel's 3-value blockwise threshold select must match the
        vmapped expanded-threshold composition exactly."""
        import jax.numpy as jnp

        from seismic_bpmf_tpu.ops.thresholds import batch_candidates

        rng = np.random.default_rng(3)
        n, swin, overlap = 137_003, 4096, 0.25
        shift = int((1.0 - overlap) * swin)
        cc = rng.normal(size=(2, n)).astype(np.float32) * 0.01
        tail = n - shift
        for p in (tail - 600, tail - 1, tail, tail + 1, n - 2):
            cc[0, p] = 0.5
            cc[1, p] = 0.45
        wn = rng.normal(size=500).astype(np.float32)
        caps = np.full(2, 0.9, np.float32)
        kw = dict(white_noise=wn, k=64, k_blocks=32, overlap=overlap,
                  margin=0.003)
        a = [np.asarray(x) for x in batch_candidates(
            jnp.asarray(cc), caps, swin, 8.0, fused=True, **kw)]
        b = [np.asarray(x) for x in batch_candidates(
            jnp.asarray(cc), caps, swin, 8.0, fused=False, **kw)]
        for t in range(2):
            na = int(a[3][t])
            assert na == int(b[3][t])
            np.testing.assert_array_equal(
                np.sort(a[0][t][:na]), np.sort(b[0][t][:na]))
            ia, ib = np.argsort(a[0][t][:na]), np.argsort(b[0][t][:na])
            np.testing.assert_allclose(
                a[2][t][:na][ia], b[2][t][:na][ib], rtol=2e-5, atol=2e-6)
            np.testing.assert_allclose(
                a[1][t][:na][ia], b[1][t][:na][ib], rtol=1e-6, atol=1e-7)

    def test_screen_margin_near_threshold_adversarial(self):
        """Adversarial screen-mode guarantee at the threshold boundary.

        Peaks are converged (fixed-point) to sit at thr*(1+delta) for
        deltas spanning the +-screen_margin band, then the screened
        series is perturbed by a worst-case +-eps model of the bf16 scan
        rounding (sign chosen against us at each peak).  The margin-
        widened extraction must return a SUPERSET of the exact
        detections, and the refine decision (exact cc vs screened
        threshold) must agree with the exact engine for every peak whose
        distance to threshold exceeds the measured screened-threshold
        perturbation -- which itself must stay under the documented 0.2%
        bound.  Reference decision semantics:
        BPMF/similarity_search.py:600-724."""
        import jax.numpy as jnp

        from seismic_bpmf_tpu.ops.thresholds import (
            batch_candidates, time_dependent_threshold,
        )

        rng = np.random.default_rng(11)
        n, swin, num_dev, margin, eps = 400_000, 30_000, 8.0, 0.01, 2e-4
        wn = rng.normal(size=500).astype(np.float32)
        cc = (rng.normal(size=n).astype(np.float32) * 0.01)

        deltas = np.array([-8e-3, -4e-3, -1e-3, -3e-4, 0.0,
                           3e-4, 1e-3, 4e-3, 8e-3])
        pos = (50_000 + np.arange(len(deltas)) * 30_000).astype(np.int64)

        def thr_of(x):
            return np.asarray(time_dependent_threshold(
                jnp.asarray(x), swin, num_dev, overlap=0.25,
                white_noise=wn))

        # fixed-point: pin each peak at thr*(1+delta) under its own
        # influence on the window rms
        for _ in range(4):
            thr = thr_of(cc)
            cc[pos] = thr[pos] * (1.0 + deltas)
        thr_exact = thr_of(cc)
        drift = np.abs(cc[pos] / thr_exact[pos] - 1.0 - deltas)
        assert drift.max() < 5e-5  # converged well inside the delta grid

        exact_det = cc[pos] > thr_exact[pos]

        # worst-case screened series: +eps where the exact decision is
        # "below" (pushing false positives in), -eps where "above"
        # (pushing true detections out), random rounding elsewhere
        cc_s = cc + rng.uniform(-eps, eps, size=n).astype(np.float32)
        cc_s[pos] = cc[pos] + np.where(exact_det, -eps, eps)

        thr_screen = thr_of(cc_s)
        thr_pert = float(np.max(np.abs(thr_screen / thr_exact - 1.0)))
        assert thr_pert < 2e-3  # the documented <=0.2% claim, measured

        out = [np.asarray(a) for a in batch_candidates(
            jnp.asarray(cc_s)[None], np.array([9.0], np.float32), swin,
            num_dev, overlap=0.25, white_noise=wn, k=1024,
            margin=margin)]
        idx, n_above = out[0][0], int(out[3][0])
        cand = set(idx[:n_above].tolist())
        # 1) superset: every exact detection survives the widened screen
        for p, d in zip(pos[exact_det], deltas[exact_det]):
            assert int(p) in cand, f"exact detection at delta={d} lost"
        # 2) refine agreement outside the measured threshold band
        for p, d, det in zip(pos, deltas, exact_det):
            refined = (int(p) in cand) and (cc[p] > thr_screen[p])
            if abs(cc[p] / thr_exact[p] - 1.0) > thr_pert:
                assert refined == det, (
                    f"screen decision flip at delta={d} "
                    f"(thr perturbation {thr_pert:.2e})"
                )

    def test_batch_candidates_mad(self):
        import jax.numpy as jnp

        from seismic_bpmf_tpu.ops.thresholds import batch_candidates
        from seismic_bpmf_tpu.ops import reference as ref

        rng = np.random.default_rng(5)
        n_tp, n = 3, 8000
        cc = rng.normal(size=(n_tp, n)).astype(np.float32) * 0.01
        cc[:, :40] = 0.0  # zero region exercises the noise fill
        for t in range(n_tp):
            cc[t, rng.integers(100, n, size=3)] += 0.5
        wn = rng.normal(size=n).astype(np.float32)
        caps = np.full(n_tp, 0.8, np.float32)
        idx_b, ccv_b, thv_b, na_b, _, _ = (
            np.asarray(x) for x in batch_candidates(
                jnp.asarray(cc), caps, 600, 8.0, white_noise=wn, k=32,
                threshold_type="mad",
            )
        )
        for t in range(n_tp):
            thr = ref.time_dependent_threshold(
                cc[t], 600, 8.0, threshold_type="mad", white_noise=wn
            )
            thr = np.minimum(thr, caps[t])
            want = np.flatnonzero(cc[t] - thr > 0)
            n_above = int(na_b[t])
            assert n_above == len(want)
            np.testing.assert_array_equal(
                np.sort(idx_b[t][:n_above]), want
            )


def test_time_dependent_threshold_pd():
    """Pandas-rolling BP threshold variant: strictly-past windows
    (shift 1), median + N*MAD (BPMF/template_search.py:1490-1517)."""
    from scipy.stats import median_abs_deviation

    from seismic_bpmf_tpu.ops import time_dependent_threshold_pd

    rng = np.random.default_rng(3)
    x = np.abs(rng.normal(size=2000)).astype(np.float32)
    win, ndev = 200, 8.0
    thr = time_dependent_threshold_pd(x, win, num_dev=ndev)
    assert np.isnan(thr[:win]).all()
    k = 700  # window is x[k-win:k], value shifted to index k
    w = x[k - win : k].astype(np.float64)
    expect = np.median(w) + ndev * median_abs_deviation(w)
    assert thr[k] == pytest.approx(expect, rel=1e-12)
