#!/usr/bin/env python
"""1024-template day: CC scan + batched threshold/top-k extraction.

Measures the BENCHMARKS.md "1024 templates x 1 day" rows — kernel-only
vs including detection extraction — mirroring the pipelined dispatch
order of `MatchedFilter.run_matched_filter_search` (all chunks' CC +
extraction programs dispatched before any fetch).  Round-2 state:
12.9 s/day with extraction vs 3.1 s kernel-only; round-3 target
<= ~4.5 s/day (>= 3000 GMAC/s sustained including extraction).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import time

import numpy as np


def main():
    smoke = "--cpu" in sys.argv
    if smoke:
        # force the CPU backend BEFORE any backend init (JAX_PLATFORMS
        # env is not honored when the accelerator plugin is present);
        # kernels then run in interpret mode via the backend check below
        sys.argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from seismic_bpmf_tpu.ops.pallas_mf import PallasMatchedFilterPlan
    from seismic_bpmf_tpu.ops.thresholds import batch_candidates

    precision = sys.argv[1] if len(sys.argv) > 1 else "high"
    n_tp = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    lag_block = int(sys.argv[4]) if len(sys.argv) > 4 else 8192

    rng = np.random.default_rng(0)
    n_sta, n_comp, L = 10, 3, 200
    # interpret mode cannot sweep a real day
    n_samp = 40_000 if smoke else 2_160_000
    print(f"# config: {n_tp} tp x {n_sta}x{n_comp} ch, chunk={chunk}, "
          f"B={lag_block}, {precision}", flush=True)
    data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
    tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
    mv = rng.integers(0, 400, size=(n_tp, n_sta, n_comp)).astype(np.int32)
    w = np.full((n_tp, n_sta, n_comp), 1.0 / (n_sta * n_comp), np.float32)
    wn = rng.normal(size=500).astype(np.float32)
    swin = int(1800.0 * 25.0)

    t0 = time.time()
    plans = [
        PallasMatchedFilterPlan(
            tp[i:i + chunk], mv[i:i + chunk], w[i:i + chunk], n_samp,
            precision=precision, lag_block=lag_block,
            pad_left=0, max_moveout=400,
            interpret=(jax.default_backend() == "cpu"),
        )
        for i in range(0, n_tp, chunk)
    ]
    data_pad = plans[0].pad_data(data)
    print(f"# plan build+upload: {time.time()-t0:.1f}s", flush=True)

    def extract(cc):
        caps = np.full(cc.shape[0], 0.8, np.float32)
        return batch_candidates(
            cc, caps, swin, 8.0, overlap=0.25, white_noise=wn, k=1024,
        )

    # compile both programs on the first chunk
    t0 = time.time()
    cc0 = jnp.nan_to_num(plans[0](data_pad))
    out0 = extract(cc0)
    res0 = [np.asarray(a) for a in out0]
    print(f"# compile: {time.time()-t0:.1f}s  "
          f"n_above[:4]={res0[3][:4]}", flush=True)

    def run_kernel_only():
        outs = [plan(data_pad) for plan in plans]
        return [np.asarray(o[:, ::200000]) for o in outs]

    def run_full():
        pend = []
        for plan in plans:
            cc = jnp.nan_to_num(plan(data_pad))
            pend.append(extract(cc))
        return [[np.asarray(a) for a in o] for o in pend]

    for name, fn in (("kernel-only", run_kernel_only),
                     ("with-extraction", run_full)):
        fn()  # warm (all chunks compile-check; same shapes -> cached)
        times = []
        for _ in range(3):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        dt = min(times)
        n_corr = plans[0].n_corr_unit
        gmacs = n_tp * n_sta * n_comp * n_corr * L / dt / 1e9
        print(f"{name}: {dt:.2f} s/day  {gmacs:.0f} GMAC/s sustained",
              flush=True)

    # extraction-only steady state (one chunk, x n_chunks estimate)
    cc0 = jnp.nan_to_num(plans[0](data_pad))
    cc0.block_until_ready()
    times = []
    for _ in range(5):
        t0 = time.time()
        [np.asarray(a) for a in extract(cc0)]
        times.append(time.time() - t0)
    print(f"extraction-only: {min(times)*1000:.0f} ms/chunk "
          f"(~{min(times)*len(plans):.2f} s/day)", flush=True)


if __name__ == "__main__":
    main()
