"""MF kernel timing matrix on real TPU (forces completion via fetch)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from seismic_bpmf_tpu.ops.pallas_mf import PallasMatchedFilterPlan  # noqa
from seismic_bpmf_tpu.ops.reference import matched_filter as mf_ref  # noqa

rng = np.random.default_rng(0)
n_tp, n_sta, n_comp, L = 128, 10, 3, 200
n_samp = 2_160_000
data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
mv = rng.integers(0, 400, size=(n_tp, n_sta, n_comp)).astype(np.int32)
w = np.full((n_tp, n_sta, n_comp), 1.0 / (n_sta * n_comp), np.float32)

ns_small = 20000
_cache = "/tmp/mf_ref_cache.npy"
import os
if os.path.exists(_cache):
    ref = np.load(_cache)
else:
    ref = mf_ref(tp, mv, w, data[:, :, :ns_small])
    np.save(_cache, ref)

for prec in sys.argv[1:] or ["highest", "high", "default"]:
    for lag_block in (2048,):
        plan = PallasMatchedFilterPlan(tp, mv, w, n_samp, precision=prec,
                                       lag_block=lag_block)
        dp = plan.pad_data(data)
        np.asarray(plan(dp)[:, ::200000])  # compile+run
        times = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(plan(dp)[:, ::200000])
            times.append(time.time() - t0)
        dt = min(times)
        gmacs = n_tp * n_sta * n_comp * plan.n_corr_unit * L / dt / 1e9
        plan_s = PallasMatchedFilterPlan(tp, mv, w, ns_small, precision=prec,
                                         lag_block=lag_block)
        outs = np.asarray(plan_s(plan_s.pad_data(data[:, :, :ns_small])))
        err = np.abs(outs - ref).max()
        print(f"{prec} B={lag_block}: {dt:.3f}s {gmacs:.0f} GMAC/s "
              f"maxerr={err:.2e}", flush=True)
