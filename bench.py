"""Benchmark driver.

Default run = TPU-compiled kernel parity gate (both Pallas kernels vs the
NumPy oracles on small shapes; exits nonzero on mismatch) followed by the
headline matched-filter day-scan throughput.  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric: matched-filter throughput in GMAC/s
(n_templates x n_channels x n_corr x template_samples / wall-time) for a
tutorial-shaped day scan (1 day @ 25 Hz = 2.16 M samples, 10 stations x 3
components, 200-sample templates, 128 templates) with device-resident data,
using the fused Pallas kernel.  Completion is forced by fetching a small
decimated output slice (the full CC series stays on device, as in the
production pipeline).

Other modes (each prints its own single JSON line):
  --check           parity gate only
  --bp [--n-src N]  backprojection throughput (Gpoints/s) on a smooth
                    synthetic travel-time grid (N sources x 1 day);
                    N=1,000,000 reproduces the BASELINE.json
                    "100+ stations x 1M-node grid" configuration
  --phasenet        PhaseNet full-day device-resident inference (s/day)

vs_baseline compares against a measured single-core NumPy CPU throughput
for the same computation (the reference publishes no numbers; BASELINE.json
`published` is empty — see BASELINE.md).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# reference-style CPU normalized-CC throughput (single core), GMAC/s
CPU_BASELINE_GMACS = 2.0
# reference-style CPU beamform throughput (single core), Gpoints/s
CPU_BASELINE_GPTS = 0.02


def _rung(name: str, fn, verbose: bool = True) -> bool:
    """Run one parity rung exception-proof.

    A rung that *crashes* (e.g. a Mosaic lowering rejection that
    interpret-mode tests cannot see) must degrade to a FAIL line, never
    kill the bench process before the headline JSON prints — round 3 lost
    its whole hardware record to exactly that failure mode."""
    try:
        err, ok, detail = fn()
        if verbose:
            print(f"# parity {name}: {detail} "
                  f"{'OK' if ok else 'FAIL'}", file=sys.stderr)
        return ok
    except Exception as e:  # noqa: BLE001 — any rung crash is a FAIL
        if verbose:
            msg = " ".join(str(e).split())[:160]
            print(f"# parity {name}: CRASH {type(e).__name__}: {msg} FAIL",
                  file=sys.stderr)
        return False


def check_parity(verbose: bool = True, quick: bool = False) -> bool:
    """TPU-compiled Pallas kernels vs the NumPy oracles on small shapes.

    Guards against Mosaic lowering regressions that interpret-mode tests
    (the CPU suite) cannot see.  Reference semantics:
    BPMF/similarity_search.py:526-546 (MF), template_search.py:549-572 (BP).

    quick=True gates only the MF variants the headline metric uses (each
    kernel variant costs a 1-2 min remote AOT compile; the full gate runs
    under --check).  Every rung runs via `_rung` so a crash in one rung
    reports FAIL and the rest (and the headline) still run.
    """
    from seismic_bpmf_tpu.ops import reference as ref
    from seismic_bpmf_tpu.ops.pallas_bp import beamform_pallas
    from seismic_bpmf_tpu.ops.pallas_mf import matched_filter_pallas

    rng = np.random.default_rng(7)
    ok = True

    # --- matched filter (highest + the bf16-split ladder) ---
    n_tp, n_sta, n_comp, L, n_samp = 16, 5, 3, 100, 20_000
    data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
    tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
    mv = rng.integers(0, 150, size=(n_tp, n_sta, n_comp)).astype(np.int32)
    w = rng.uniform(0.5, 1.0, size=(n_tp, n_sta, n_comp)).astype(np.float32)
    w /= w.sum(axis=(1, 2), keepdims=True)
    cc_ref = ref.matched_filter(tp, mv, w, data)

    def mf_rung(prec, tol, **kw):
        def fn():
            from seismic_bpmf_tpu.ops.pallas_mf import (
                PallasMatchedFilterPlan,
            )
            if kw:
                plan = PallasMatchedFilterPlan(tp, mv, w, n_samp,
                                               precision=prec, **kw)
                cc = np.asarray(plan(plan.pad_data(data)))
                cc = cc[:, : cc_ref.shape[1]]
            else:
                cc = np.asarray(
                    matched_filter_pallas(tp, mv, w, data, precision=prec)
                )
            err = float(np.abs(cc - cc_ref).max())
            return err, err <= tol, f"max|diff|={err:.2e}"
        return fn

    # the default plan auto-picks dense (unpredicated) vs predicated from
    # the live-block fraction; gate BOTH code paths at the headline
    # precision so whichever the heuristic picks is always parity-checked
    # TPU-compiled (hardware-promoted after the round-4 sweep: dense won
    # +16%, scripts/validate_dense.py passed at both precisions)
    for prec, tol in (("highest", 5e-6), ("high", 5e-6)):
        ok &= _rung(f"MF[{prec}]", mf_rung(prec, tol), verbose)
    ok &= _rung("MF[high,dense]", mf_rung("high", 5e-6, dense=True),
                verbose)
    ok &= _rung("MF[high,predicated]",
                mf_rung("high", 5e-6, dense=False), verbose)
    if quick:
        return ok

    # --- beamformer, both reduce modes, highest + ladder ---
    n_src, n_ph, n_samp_bp = 200, 2, 8_192
    feat = rng.normal(size=(n_sta, n_comp, n_samp_bp)).astype(np.float32)
    mv_bp = rng.integers(0, 300, size=(n_src, n_sta, n_ph)).astype(np.int32)
    w_ph = np.zeros((n_sta, n_comp, n_ph), np.float32)
    w_ph[:, 2, 0] = 1.0
    w_ph[:, :2, 1] = 0.5
    w_src = rng.uniform(0.5, 1.0, size=(n_src, n_sta)).astype(np.float32)
    mb_ref, ms_ref = ref.beamform(feat, mv_bp, w_ph, w_src, reduce="max")
    beam_ref = ref.beamform(feat, mv_bp, w_ph, w_src, reduce="none")

    def bp_rung(prec, tol):
        def fn():
            mb, ms = beamform_pallas(feat, mv_bp, w_ph, w_src,
                                     reduce="max", precision=prec)
            err_bp = float(np.abs(np.asarray(mb) - mb_ref).max())
            argmax_agree = float(np.mean(np.asarray(ms) == ms_ref))
            beam = np.asarray(
                beamform_pallas(feat, mv_bp, w_ph, w_src, reduce="none",
                                precision=prec)
            )
            err_bp_none = float(np.abs(beam - beam_ref).max())
            # ladder argmax may flip only at value-tolerance near-ties
            am_ok = argmax_agree == 1.0 if prec == "highest" \
                else argmax_agree > 0.999
            rung_ok = err_bp <= tol and err_bp_none <= tol and am_ok
            return err_bp, rung_ok, (
                f"max|diff| max={err_bp:.2e} none={err_bp_none:.2e} "
                f"argmax_agree={argmax_agree:.4f}"
            )
        return fn

    for prec, tol in (("highest", 2e-5), ("high", 2e-4)):
        ok &= _rung(f"BP[{prec}]", bp_rung(prec, tol), verbose)

    # large-network fallback path (narrowed, nq-predicated Hankel rebuild)
    def bp_nohoist():
        w_sparse = w_src.copy()
        w_sparse[:, ::2] = 0.0  # dead (station-phase, block) pairs
        mb_ref2, ms_ref2 = ref.beamform(feat, mv_bp, w_ph, w_sparse,
                                        reduce="max")
        mb2, ms2 = beamform_pallas(feat, mv_bp, w_ph, w_sparse,
                                   reduce="max", precision="high",
                                   hoist_hankel=False)
        err2 = float(np.abs(np.asarray(mb2) - mb_ref2).max())
        am2 = float(np.mean(np.asarray(ms2) == ms_ref2))
        return err2, err2 <= 2e-4 and am2 >= 0.999, (
            f"max|diff|={err2:.2e} argmax_agree={am2:.4f}"
        )

    ok &= _rung("BP[no-hoist,high,sparse]", bp_nohoist, verbose)
    return ok


def bench_mf(precision: str = "high"):
    """Headline MF day-scan throughput.  Default precision 'high' (the
    bf16-split ladder) passes the same 5e-6 oracle gate as 'highest' —
    `check_parity` machine-checks both on every bench run."""
    import jax

    from seismic_bpmf_tpu.ops.pallas_mf import PallasMatchedFilterPlan

    rng = np.random.default_rng(0)
    n_tp, n_sta, n_comp, L = 128, 10, 3, 200
    n_samp = 2_160_000
    data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
    tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
    mv = rng.integers(0, 400, size=(n_tp, n_sta, n_comp)).astype(np.int32)
    w = np.full((n_tp, n_sta, n_comp), 1.0 / (n_sta * n_comp), np.float32)

    # single 128-template plan (VMEM-bounded chunk), data transferred once
    chunk = 128
    plans = [
        PallasMatchedFilterPlan(
            tp[i : i + chunk], mv[i : i + chunk], w[i : i + chunk], n_samp,
            precision=precision,
        )
        for i in range(0, n_tp, chunk)
    ]
    data_pad = plans[0].pad_data(data)

    def run():
        outs = [plan(data_pad) for plan in plans]
        # force completion with a tiny fetch (full CC stays on device)
        return [np.asarray(o[:, ::200000]) for o in outs]

    run()  # compile
    times = []
    for _ in range(5):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    dt = float(np.median(times))
    n_corr = plans[0].n_corr_unit
    gmacs = n_tp * n_sta * n_comp * n_corr * L / dt / 1e9
    return {
        "metric": "matched_filter_throughput",
        "value": round(gmacs, 1),
        "unit": f"GMAC/s/chip (128 templates x 30 ch x 1 day @ 25 Hz, "
                f"{precision}, median of 5; min-rep "
                f"{n_tp * n_sta * n_comp * n_corr * L / min(times) / 1e9:.0f})",
        "vs_baseline": round(gmacs / CPU_BASELINE_GMACS, 1),
    }


def _pipelined_median(step, consume, arg, reps=6, sets=3):
    """Steady-state campaign pipeline timing shared by the extraction and
    screen extras: day N+1's device program is dispatched before day N's
    results are consumed (fetch/refine overlaps device compute, exactly
    the `scan_days` dispatch order).  Median over `sets` pipeline sets —
    single 6-day samples swung up to 13% with tunnel conditions."""
    dts = []
    for _ in range(sets):
        t0 = time.time()
        pend = step(arg)
        for _ in range(reps - 1):
            nxt = step(arg)
            consume(pend)
            pend = nxt
        consume(pend)
        dts.append((time.time() - t0) / reps)
    return float(np.median(dts))


def bench_mf_extraction(precision: str = "high"):
    """Sustained MF throughput INCLUDING detection extraction: the same
    128-template day as `bench_mf`, with each chunk's CC running through
    the batched time-dependent threshold + two-stage top-k candidate
    extraction (`ops.thresholds.batch_candidates`) exactly as the
    campaign scan dispatches it (extraction program queued behind the CC
    scan, O(k) candidate values fetched).  Kernel shapes match `bench_mf`
    so the scan compile is shared within one bench run."""
    import jax.numpy as jnp

    from seismic_bpmf_tpu.ops.pallas_mf import PallasMatchedFilterPlan
    from seismic_bpmf_tpu.ops.thresholds import batch_candidates

    rng = np.random.default_rng(0)
    n_tp, n_sta, n_comp, L = 128, 10, 3, 200
    n_samp = 2_160_000
    data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
    tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
    mv = rng.integers(0, 400, size=(n_tp, n_sta, n_comp)).astype(np.int32)
    w = np.full((n_tp, n_sta, n_comp), 1.0 / (n_sta * n_comp), np.float32)
    wn = rng.normal(size=500).astype(np.float32)
    swin = int(1800.0 * 25.0)  # reference 1800 s threshold window @ 25 Hz

    plan = PallasMatchedFilterPlan(tp, mv, w, n_samp, precision=precision)
    data_pad = plan.pad_data(data)
    caps = np.full(n_tp, 0.8, np.float32)

    # scan + threshold/extraction enqueue back-to-back (async dispatch);
    # the packed extraction output crosses to the host in ONE fetch.
    # (Do NOT jit-compose over plan(): the plan's device-resident filter
    # banks would become closure-captured literal constants of the
    # composed HLO -- hundreds of MB, pathological compile times.)
    from seismic_bpmf_tpu.ops.thresholds import RmsExtractionPlan

    eplan = RmsExtractionPlan(plan.n_corr_unit, swin, overlap=0.25,
                              white_noise=wn, k=1024)
    caps_j = jnp.asarray(caps)

    def step(d):
        cc = jnp.nan_to_num(plan(d))
        return eplan.extract(cc, caps_j, 8.0, pack=True)

    eplan.unpack(step(data_pad))  # compile + warm
    dt = _pipelined_median(step, eplan.unpack, data_pad)
    gmacs = n_tp * n_sta * n_comp * plan.n_corr_unit * L / dt / 1e9
    return {
        "metric": "matched_filter_with_extraction",
        "value": round(gmacs, 1),
        "unit": f"GMAC/s/chip sustained incl. threshold+top-k extraction "
                f"(128 templates x 1 day, {precision}, 6-day "
                f"pipelined steady state)",
        "vs_baseline": round(gmacs / CPU_BASELINE_GMACS, 1),
    }


def bench_mf_screen():
    """Screen-mode sustained throughput: the `bench_mf_extraction` day at
    'default' (single bf16 pass) scan precision with margin-widened
    extraction, plus the exact float64 host refine of every candidate —
    the full cost of producing detections whose CC values match the f32
    oracle (engine: `MatchedFilter(precision='screen')`; only the
    time-dependent threshold keeps the screened series' ~2e-4 rounding).
    """
    import jax.numpy as jnp

    from seismic_bpmf_tpu.ops.pallas_mf import PallasMatchedFilterPlan
    from seismic_bpmf_tpu.ops.reference import matched_filter_at
    from seismic_bpmf_tpu.ops.thresholds import batch_candidates

    rng = np.random.default_rng(0)
    n_tp, n_sta, n_comp, L = 128, 10, 3, 200
    n_samp = 2_160_000
    data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
    tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
    mv = rng.integers(0, 400, size=(n_tp, n_sta, n_comp)).astype(np.int32)
    w = np.full((n_tp, n_sta, n_comp), 1.0 / (n_sta * n_comp), np.float32)
    wn = rng.normal(size=500).astype(np.float32)
    swin = int(1800.0 * 25.0)

    # inject ~10 occurrences of every 4th template (CC ~ 0.45 >> the
    # ~0.10 time-dependent threshold) so the refine stage runs against a
    # realistically active day instead of pure noise
    for t in range(0, n_tp, 4):
        for o in rng.integers(0, n_samp - 1200, size=10):
            for s in range(n_sta):
                for c in range(n_comp):
                    b = int(o) + int(mv[t, s, c])
                    data[s, c, b : b + L] += 0.5 * tp[t, s, c]

    plan = PallasMatchedFilterPlan(tp, mv, w, n_samp, precision="default")
    data_pad = plan.pad_data(data)
    caps = np.full(n_tp, 0.8, np.float32)

    # per day: bf16 scan + margin-widened threshold/extraction enqueued
    # back-to-back (async dispatch, one packed host fetch); the float64
    # host refine then restores oracle CC values at every candidate --
    # the screen engine's production dispatch order
    from seismic_bpmf_tpu.ops.thresholds import RmsExtractionPlan

    eplan = RmsExtractionPlan(plan.n_corr_unit, swin, overlap=0.25,
                              white_noise=wn, k=1024)
    caps_j = jnp.asarray(caps)

    def step(d):
        cc = jnp.nan_to_num(plan(d))
        return eplan.extract(cc, caps_j, 8.0, margin=0.01, pack=True)

    def refine(out):
        idx, ccv, thv, n_above = eplan.unpack(out)[:4]
        n_ref = 0
        for t in range(n_tp):
            n = min(int(n_above[t]), idx.shape[1])
            if n:
                matched_filter_at(tp[t], mv[t], w[t], data, idx[t, :n])
                n_ref += n
        return n_ref

    n_ref = refine(step(data_pad))  # compile + warm
    dt = _pipelined_median(step, refine, data_pad)
    gmacs = n_tp * n_sta * n_comp * plan.n_corr_unit * L / dt / 1e9
    return {
        "metric": "matched_filter_detection_parity_throughput",
        "value": round(gmacs, 1),
        "unit": f"GMAC/s/chip sustained incl. extraction + exact refine of "
                f"{n_ref} candidates/day (128 templates x 1 day, screen, "
                f"6-day pipelined steady state)",
        "vs_baseline": round(gmacs / CPU_BASELINE_GMACS, 1),
    }


def smooth_grid_moveouts(n_src: int, n_sta: int = 32, sr_hz: float = 25.0,
                         seed: int = 1):
    """Synthetic 3-D travel-time grid: sources on a regular
    lon x lat x depth lattice inside a ~100 km box, stations scattered on
    the surface, straight-ray P/S times at 6.0/3.4 km/s, moveouts relative
    to the first arrival (the BPMF convention,
    BPMF/template_search.py:170-220)."""
    rng = np.random.default_rng(seed)
    # lattice dims ~ (nx, ny, nz) with nx*ny*nz >= n_src
    nz = max(2, int(round((n_src / 64) ** (1.0 / 3.0))))
    nxy = int(np.ceil(np.sqrt(n_src / nz)))
    xs = np.linspace(0.0, 100.0, nxy)
    ys = np.linspace(0.0, 100.0, nxy)
    zs = np.linspace(2.0, 30.0, nz)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    src = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)[:n_src]
    sta = np.column_stack([
        rng.uniform(0, 100, n_sta), rng.uniform(0, 100, n_sta),
        np.zeros(n_sta),
    ])
    d = np.linalg.norm(src[:, None, :] - sta[None, :, :], axis=2)  # km
    tt = np.stack([d / 6.0, d / 3.4], axis=2)  # (n_src, n_sta, 2) seconds
    mv = np.round(tt * sr_hz).astype(np.int32)
    mv -= mv.min(axis=(1, 2), keepdims=True)  # relative to first arrival
    return mv


def bench_bp(n_src: int = 100_000, n_sta: int = 32, time_block: int = 1024,
             src_block: int = 512, precision: str = "highest",
             budget_s: float = 90.0):
    """Beamform throughput on a smooth synthetic grid.

    The day runs through `PallasBeamformPlan.call_folded_chunked`-style
    chunk calls (16 time blocks each) so no single XLA execution exceeds a
    few tens of seconds; as many steady-state chunks as fit in `budget_s`
    are timed and the day figure is their measured rate.  Each chunk does
    identical work (uniform grid sweep), so the rate is representative."""
    import jax
    import jax.numpy as jnp

    from seismic_bpmf_tpu.ops.pallas_bp import PallasBeamformPlan

    rng = np.random.default_rng(0)
    n_comp, n_samp = 3, 2_160_000
    mv = smooth_grid_moveouts(n_src, n_sta)
    w_ph = np.zeros((n_sta, n_comp, 2), np.float32)
    w_ph[:, 2, 0] = 1.0   # P on vertical
    w_ph[:, :2, 1] = 0.5  # S on horizontals
    # closest-10-stations source weights (normalized), BPMF-style
    closest = np.argsort(mv[:, :, 0], axis=1)[:, :10]
    w_src = np.zeros((n_src, n_sta), np.float32)
    np.put_along_axis(w_src, closest, 1.0 / 10.0, axis=1)
    feat = rng.uniform(0, 1, size=(n_sta, n_comp, n_samp)).astype(np.float32)

    t_setup = time.time()
    plan = PallasBeamformPlan(
        mv, w_ph, w_src, n_samp, reduce="max",
        time_block=time_block, src_block=src_block, precision=precision,
    )
    g_pad = plan.fold_and_pad(feat)
    g_pad.block_until_ready()
    print(f"# bp plan+fold: {time.time() - t_setup:.1f}s "
          f"(M={plan.M} S={plan.S} n_q={plan.n_q})", file=sys.stderr)
    blocks_per = 16
    samp_per = blocks_per * plan.B

    def chunk(c):
        t0 = c * samp_per
        g_c = jax.lax.dynamic_slice_in_dim(
            g_pad, t0, samp_per + plan.M, axis=1
        )
        from seismic_bpmf_tpu.ops.pallas_bp import _bp_pallas_call
        v, i = _bp_pallas_call(
            plan.qbase, plan.nq, plan.mv, plan.w, plan.lo, plan.hi, g_c,
            jnp.asarray([[t0, 0]], jnp.int32),
            B=plan.B, M=plan.M, S=plan.S, n_q=plan.n_q,
            n_samp=plan.n_samp, n_src=plan.n_src, strict=plan.strict,
            reduce_max=True, precision=plan.precision, mode=plan.mode,
        )
        return np.asarray(v[0, ::20000]), np.asarray(i[0, ::20000])

    t_setup = time.time()
    chunk(0)  # compile + warm
    print(f"# bp compile+warm: {time.time() - t_setup:.1f}s",
          file=sys.stderr)
    n_chunks_total = plan.n_t_blocks // blocks_per
    done, t_start = 0, time.time()
    while done < n_chunks_total and time.time() - t_start < budget_s:
        chunk(done % n_chunks_total)
        done += 1
    dt = time.time() - t_start
    gpts = n_src * done * samp_per / dt / 1e9
    day_min = n_samp / (gpts * 1e9 / n_src) / 60.0
    return {
        "metric": "beamform_throughput",
        "value": round(gpts, 2),
        "unit": f"Gpoints/s/chip ({n_src} src x {n_sta} sta, {precision}; "
                f"{done}/{n_chunks_total} day-chunks measured -> "
                f"{day_min:.1f} min/day)",
        "vs_baseline": round(gpts / CPU_BASELINE_GPTS, 1),
    }


def bench_phasenet():
    import jax

    from seismic_bpmf_tpu.models.phasenet import (
        init_phasenet, phasenet_probas_device,
    )

    rng = np.random.default_rng(0)
    n_sta, n_samp = 10, 2_160_000
    x = rng.normal(size=(n_sta, 3, n_samp)).astype(np.float32)
    model, variables = init_phasenet()
    xj = jax.device_put(x)

    def run():
        probas = phasenet_probas_device(model, variables, xj)
        return np.asarray(probas[:, :, ::200000])

    run()  # compile
    times = []
    for _ in range(5):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    dt = float(np.median(times))
    return {
        "metric": "phasenet_day_inference",
        "value": round(dt, 2),
        "unit": "s/day (10 sta x 3 comp x 2.16 M samples, device-resident, "
                "median of 5)",
        "vs_baseline": round(60.0 / dt, 1),  # ~1 min/day torch-CPU ballpark
    }


def probe_backend(timeout_s: float = 420.0) -> str | None:
    """Bounded accelerator-init probe: run a trivial matmul in a worker
    thread; if init blocks past `timeout_s` (a wedged single-chip worker
    can take ~25 min per blocked attempt) or raises, return a short
    diagnostic string so the caller can emit a parseable JSON record
    instead of hanging.  See scripts/tpu_wait.py for the recover-and-wait
    pattern."""
    import threading

    result: dict = {}

    def work():
        try:
            import jax

            x = jax.numpy.ones((128, 128))
            jax.block_until_ready(x @ x)
            result["ok"] = jax.default_backend()
        except Exception as e:  # noqa: BLE001
            result["err"] = f"{type(e).__name__}: " \
                            f"{' '.join(str(e).split())[:200]}"

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return f"backend init still blocked after {timeout_s:.0f}s " \
               f"(wedged TPU worker?) — see scripts/tpu_wait.py"
    return result.get("err")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="TPU kernel parity gate only")
    ap.add_argument("--bp", action="store_true",
                    help="beamform throughput instead of matched filter")
    ap.add_argument("--n-src", type=int, default=100_000)
    ap.add_argument("--n-sta", type=int, default=32,
                    help="BP: station count (BASELINE dense-array config "
                         "uses 128)")
    ap.add_argument("--precision", default=None,
                    choices=["highest", "high", "default"],
                    help="kernel precision (default: 'high' for the MF "
                         "headline, 'highest' for --bp)")
    ap.add_argument("--budget-s", type=float, default=90.0,
                    help="BP: steady-state measurement budget in seconds")
    ap.add_argument("--phasenet", action="store_true",
                    help="PhaseNet day-inference metric")
    ap.add_argument("--no-check", action="store_true",
                    help="skip the parity gate before the throughput run")
    args = ap.parse_args()

    err = probe_backend(
        float(os.environ.get("BENCH_INIT_TIMEOUT_S", "420"))
    )
    if err is not None:
        print(json.dumps({
            "metric": "matched_filter_throughput",
            "value": 0.0,
            "unit": f"GMAC/s/chip (TPU BACKEND UNAVAILABLE: {err})",
            "vs_baseline": 0.0,
        }))
        sys.exit(1)

    if args.check:
        ok = check_parity()
        print(json.dumps({
            "metric": "tpu_kernel_parity",
            "value": 1 if ok else 0,
            "unit": "bool (MF+BP Pallas vs NumPy oracles, TPU-compiled)",
            "vs_baseline": 1.0,
        }))
        sys.exit(0 if ok else 1)

    if args.bp:
        print(json.dumps(bench_bp(n_src=args.n_src, n_sta=args.n_sta,
                                  precision=args.precision or "highest",
                                  budget_s=args.budget_s)))
        return
    if args.phasenet:
        print(json.dumps(bench_phasenet()))
        return

    if not args.no_check and not check_parity(quick=True):
        print(json.dumps({
            "metric": "matched_filter_throughput",
            "value": 0.0,
            "unit": "GMAC/s/chip (PARITY GATE FAILED)",
            "vs_baseline": 0.0,
        }))
        sys.exit(1)
    try:
        result = bench_mf(precision=args.precision or "high")
    except Exception as e:  # always print one parseable JSON line
        msg = f"{type(e).__name__}: {' '.join(str(e).split())[:200]}"
        print(json.dumps({
            "metric": "matched_filter_throughput",
            "value": 0.0,
            "unit": f"GMAC/s/chip (HEADLINE CRASH: {msg})",
            "vs_baseline": 0.0,
        }))
        sys.exit(1)
    # secondary driver-visible figures (stderr comment lines + extras
    # file); BENCH_QUICK=1 skips them
    if not os.environ.get("BENCH_QUICK"):
        extras = {}
        for name, fn in (
            ("mf_extraction", bench_mf_extraction),
            ("mf_screen", bench_mf_screen),
            # the BASELINE fine-grid config is 1M sources; 100k in the
            # extras keeps the plan build + sweep inside the driver's
            # budget while exercising the same chunked production path
            ("beamform", lambda: bench_bp(n_src=100_000, budget_s=60.0,
                                          precision="high")),
            ("phasenet", bench_phasenet),
        ):
            try:
                r = fn()
                extras[name] = r
                print(f"# {r['metric']}: {r['value']} {r['unit']}",
                      file=sys.stderr)
            except Exception as e:  # never lose the headline to an extra
                print(f"# {name} extra failed: {type(e).__name__}: "
                      f"{str(e)[:160]}", file=sys.stderr)
        try:
            with open("BENCH_EXTRAS.json", "w") as fh:
                json.dump(extras, fh, indent=1)
        except OSError:
            pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
