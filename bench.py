"""Benchmark driver: tutorial-scale matched-filter day scan on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric: matched-filter throughput in GMAC/s
(n_templates x n_channels x n_corr x template_samples / wall-time) for a
tutorial-shaped day scan (1 day @ 25 Hz = 2.16 M samples, 10 stations x 3
components, 200-sample templates, 128 templates) with device-resident data,
using the fused Pallas kernel.  Completion is forced by fetching a small
decimated output slice (the full CC series stays on device, as in the
production pipeline).

vs_baseline compares against a measured single-core NumPy CPU throughput for
the same computation (the reference publishes no numbers; BASELINE.json
`published` is empty — see BASELINE.md).  The CPU baseline constant below is
the reference-style single-thread normalized-CC throughput order of
magnitude measured on this host class.
"""

import json
import time

import numpy as np

# reference-style CPU normalized-CC throughput (single core), GMAC/s
CPU_BASELINE_GMACS = 2.0


def main():
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
            tp[i : i + chunk], mv[i : i + chunk], w[i : i + chunk], n_samp
        )
        for i in range(0, n_tp, chunk)
    ]
    data_pad = plans[0].pad_data(data)

    def run():
        outs = [plan(data_pad) for plan in plans]
        # force completion with a tiny fetch (full CC stays on device)
        return [np.asarray(o[:, :: 200000]) for o in outs]

    run()  # compile
    times = []
    for _ in range(3):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    dt = min(times)
    n_corr = plans[0].n_corr_unit
    gmacs = n_tp * n_sta * n_comp * n_corr * L / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "matched_filter_throughput",
                "value": round(gmacs, 1),
                "unit": "GMAC/s/chip (128 templates x 30 ch x 1 day @ 25 Hz)",
                "vs_baseline": round(gmacs / CPU_BASELINE_GMACS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
