#!/usr/bin/env python
"""Hardware parity gate for the unpredicated 'dense' MF kernel variant.

Interpret-mode tests cannot catch Mosaic lowering issues; this gate
PASSED on the real chip (round 4, all four cells) and dense became the
live-block-fraction auto default in `PallasMatchedFilterPlan`.  Re-run
after any kernel change:

    python scripts/validate_dense.py        # ~2-4 min (two compiles)

Prints PASS/FAIL per (precision, dense) cell against the NumPy oracle.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import time

import numpy as np


def main():
    interpret = False
    if "--cpu" in sys.argv:
        # smoke mode: force the CPU backend BEFORE any backend init (the
        # JAX_PLATFORMS env var is not honored when the accelerator plugin
        # is present) and run the kernels in interpret mode at tiny sizes
        import jax

        jax.config.update("jax_platforms", "cpu")
        interpret = True

    from seismic_bpmf_tpu.ops import reference as ref
    from seismic_bpmf_tpu.ops.pallas_mf import PallasMatchedFilterPlan

    rng = np.random.default_rng(7)
    # Lowering coverage, not scale: 12 lag blocks at the default
    # lag_block=4096 (incl. a partial tail at lag_block=4096) and a
    # 400-sample moveout spread exercise the same Mosaic code paths
    # (multi-block sweep, octave predication, one-hot select) as a
    # production bank, while keeping the float64-accumulated NumPy oracle
    # tractable on this host's single CPU core.  n_tp=16 = two 8-row
    # template tiles, so the multi-tile template iteration is covered too.
    n_tp, n_sta, n_comp, L, n_samp = 16, 10, 3, 200, 48_000
    if interpret:
        n_tp, n_samp = 8, 20_000
    tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
    mv = rng.integers(0, 400, size=(n_tp, n_sta, n_comp)).astype(np.int32)
    w = np.full((n_tp, n_sta, n_comp), 1.0 / (n_sta * n_comp), np.float32)
    data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
    # the cache key must cover EVERY oracle input (templates, moveouts,
    # weights, data) plus an oracle version tag, or a config change would
    # silently reuse a stale oracle and this gate could pass against
    # wrong expected values
    import hashlib

    h = hashlib.sha256()
    h.update(b"oracle-v1")
    for a in (tp, mv, w, data):
        h.update(a.tobytes())
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".oracle_dense_{h.hexdigest()[:16]}.npy")
    t0 = time.time()
    if os.path.exists(cache):
        cc_ref = np.load(cache)
        print(f"oracle: loaded cache ({cache})", flush=True)
    else:
        cc_ref = ref.matched_filter(tp, mv, w, data)
        np.save(cache, cc_ref)
        print(f"oracle: computed in {time.time()-t0:.0f}s", flush=True)

    ok = True
    for precision, tol in (("high", 5e-6), ("highest", 5e-7)):
        for dense in (False, True):
            t0 = time.time()
            plan = PallasMatchedFilterPlan(
                tp, mv, w, n_samp, precision=precision, dense=dense,
                interpret=interpret,
            )
            cc = np.asarray(plan(plan.pad_data(data)))
            err = float(np.abs(cc - cc_ref).max())
            status = "PASS" if err < tol else "FAIL"
            ok &= status == "PASS"
            print(f"{precision:8s} dense={dense!s:5s}: max err {err:.2e} "
                  f"(tol {tol:.0e}) {status}  [{time.time()-t0:.0f}s]",
                  flush=True)
    print("DENSE VALIDATION:", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
