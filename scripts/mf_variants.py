#!/usr/bin/env python
"""MF kernel configuration sweep: lag-block depth (B) x template-chunk
size, at 'high' precision, on the headline day shape.  Picks the fastest
(B, chunk) to promote as the production default (BENCHMARKS.md Caveats:
deeper lag blocks amortize the per-block Hankel/split VPU work; larger
template chunks amortize it across more templates).

    python scripts/mf_variants.py [n_tp] [combos...]
    # combos as B:chunk, e.g. 4096:128 8192:128 8192:256
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import time

import numpy as np


def main():
    diag_sweep = "--diag" in sys.argv
    if diag_sweep:
        sys.argv.remove("--diag")
    smoke = "--cpu" in sys.argv
    if smoke:
        # force the CPU backend BEFORE any backend init (JAX_PLATFORMS
        # env is not honored when the accelerator plugin is present);
        # kernels then run in interpret mode via the backend check below
        sys.argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from seismic_bpmf_tpu.ops.pallas_mf import PallasMatchedFilterPlan

    n_tp = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    combos = [
        tuple(map(int, c.split(":")))
        for c in (sys.argv[2:] or ["4096:128", "8192:128", "8192:256",
                                   "16384:128"])
    ]
    rng = np.random.default_rng(0)
    n_sta, n_comp, L = 10, 3, 200
    # interpret mode cannot sweep a real day
    n_samp = 40_000 if smoke else 2_160_000
    data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
    tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
    mv = rng.integers(0, 400, size=(n_tp, n_sta, n_comp)).astype(np.int32)
    w = np.full((n_tp, n_sta, n_comp), 1.0 / (n_sta * n_comp), np.float32)

    # oracle slice for a correctness spot-check: first 2 templates over a
    # data PREFIX only — the float64 NumPy oracle runs ~13 MMAC/s on this
    # host, so a full-day oracle would cost ~30 min before any TPU work.
    # Lags < n_pref - L - max_mv depend only on the prefix, so comparing
    # that lag range against the full-day kernel output is exact.
    from seismic_bpmf_tpu.ops import reference as ref

    n_pref = min(n_samp, 24_000)
    max_mv_check = int(mv[:2].max())
    n_lag_check = n_pref - L - max_mv_check + 1
    cc_ref = ref.matched_filter(
        tp[:2], mv[:2], w[:2], data[:, :, :n_pref]
    )[:, :n_lag_check]

    import jax

    def make_plans(B, chunk, prec):
        # variant tags after "high-": dense (unpredicated accumulation),
        # diag:X (stage-removal cost attribution — WRONG results, timing
        # only).  fused/pack/unroll variants were deleted after the
        # round-4 hardware sweep (fused a wash — the kernel is MXU-bound;
        # pack and partial unroll fail Mosaic lowering; full unroll
        # crashes the compiler).
        tags = prec.split("-")[1:]
        diag = ""
        for t in tags:
            if t.startswith("diag:"):
                diag = t[5:]
        plans = []
        for i in range(0, n_tp, chunk):
            p = PallasMatchedFilterPlan(
                tp[i:i + chunk], mv[i:i + chunk], w[i:i + chunk],
                n_samp,
                interpret=(jax.default_backend() == "cpu"),
                precision=("high" if prec.startswith("high") else prec),
                lag_block=B, pad_left=0, max_moveout=400,
                dense="dense" in tags,
                ysel=("gather" if "gather" in tags else "matmul"),
                diag=diag,
            )
            plans.append(p)
        return plans

    # "high" is the predicated production default; "high-dense" forces
    # the unpredicated functional-accumulation variant; the "gather" tag
    # swaps the one-hot normalization-select matmuls for per-template
    # dynamic y-row slices (exact f32, no y Hankel roll / bf16 y split)
    precs = ["high", "high-dense", "high-dense-gather", "high-gather"]
    if diag_sweep:
        # stage-removal attribution: each mode removes ONE kernel stage;
        # (baseline - mode) wall time = that stage's cost on hardware
        precs = ["high-dense", "high-dense-diag:noroll",
                 "high-dense-diag:nonorm", "high-dense-diag:nocorr",
                 "high-dense-diag:noysel", "high-dense-diag:nomask"]
    for B, chunk in combos:
      for prec in precs:
        try:
            t0 = time.time()
            plans = make_plans(B, chunk, prec)
            data_pad = plans[0].pad_data(data)

            def run():
                outs = [plan(data_pad) for plan in plans]
                return [np.asarray(o[:, ::200000]) for o in outs]

            run()
            t_compile = time.time() - t0
            times = []
            for _ in range(3):
                t0 = time.time()
                run()
                times.append(time.time() - t0)
            dt = min(times)
            n_corr = plans[0].n_corr_unit
            gmacs = n_tp * n_sta * n_comp * n_corr * L / dt / 1e9
            err = float(
                np.abs(
                    np.asarray(plans[0](data_pad)[:2, : cc_ref.shape[1]])
                    - cc_ref
                ).max()
            )
            print(f"B={B:6d} chunk={chunk:4d} {prec:9s}: {dt:6.3f} s/day "
                  f"{gmacs:6.0f} GMAC/s  err={err:.2e} "
                  f"(compile {t_compile:.0f}s)", flush=True)
        except Exception as e:
            print(f"B={B:6d} chunk={chunk:4d} {prec:9s}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
