"""Stage attribution for the extraction-inclusive MF day scan.

Where do the ~300 ms between kernel-only (0.32 s) and
extraction-inclusive (0.62 s) go at 128 templates?  Times each stage of
`bench_mf_extraction` separately on the real chip:

  scan        the Pallas CC scan + tiny fetch (bench_mf's measurement)
  nan         jnp.nan_to_num over the (128, 2.16M) stack
  thresh      the vmapped time-dependent threshold alone
  extract     the two-stage top-k alone (given precomputed thresholds)
  batch       the fused batch_candidates program, fetch included
  fetch       host fetch of the 6 batch_candidates outputs alone

Run: python scripts/extract_diag.py [--precision high|default]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timed(label, fn, reps=3):
    fn()  # compile/warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{label:>10}: min {min(ts)*1e3:8.1f} ms  "
          f"med {sorted(ts)[len(ts)//2]*1e3:8.1f} ms", file=sys.stderr)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="high")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from seismic_bpmf_tpu.ops.pallas_mf import PallasMatchedFilterPlan
    from seismic_bpmf_tpu.ops.thresholds import (
        _batch_candidates_kernel, _candidate_extract_two_stage,
        _tdt_rms_kernel, batch_candidates,
    )

    rng = np.random.default_rng(0)
    n_tp, n_sta, n_comp, L = 128, 10, 3, 200
    n_samp = 2_160_000
    data = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
    tp = rng.normal(size=(n_tp, n_sta, n_comp, L)).astype(np.float32)
    mv = rng.integers(0, 400, size=(n_tp, n_sta, n_comp)).astype(np.int32)
    w = np.full((n_tp, n_sta, n_comp), 1.0 / (n_sta * n_comp), np.float32)
    wn = rng.normal(size=500).astype(np.float32)
    swin = int(1800.0 * 25.0)

    plan = PallasMatchedFilterPlan(tp, mv, w, n_samp,
                                   precision=args.precision)
    data_pad = plan.pad_data(data)
    caps = np.full(n_tp, 0.8, np.float32)
    n = plan.n_corr_unit

    # threshold window geometry (mirrors batch_candidates rms path)
    half_win = min(swin, n) // 2
    shift = max(int((1.0 - 0.25) * min(swin, n)), 1)
    win = 2 * half_win
    n_win = (n - (win - shift)) // shift
    gauss = jnp.asarray(wn)

    def scan():
        out = plan(data_pad)
        return np.asarray(out[:, ::200000])

    timed("scan", scan)

    cc = jnp.nan_to_num(plan(data_pad))
    cc.block_until_ready()

    def nan():
        return np.asarray(jnp.nan_to_num(plan(data_pad))[:, ::200000])

    timed("scan+nan", nan)

    tdt = jax.jit(jax.vmap(
        lambda x: _tdt_rms_kernel(x, gauss, jnp.float32(8.0), win=win,
                                  shift=shift, n_win=n_win)
    ))

    def thresh():
        return np.asarray(tdt(cc)[:, ::200000])

    timed("thresh", thresh)

    thr = tdt(cc)
    thr.block_until_ready()

    ext = jax.jit(jax.vmap(
        lambda x, t: _candidate_extract_two_stage(x, t, 1024, 256)
    ))

    def extract():
        out = ext(cc, thr)
        return [np.asarray(a) for a in out]

    timed("extract", extract)

    def batch():
        out = batch_candidates(cc, caps, swin, 8.0, overlap=0.25,
                               white_noise=wn, k=1024)
        return [np.asarray(a) for a in out]

    timed("batch", batch)

    out_dev = _batch_candidates_kernel(
        cc, gauss, jnp.float32(8.0), jnp.asarray(caps),
        jnp.float32(0.0), win=win, shift=shift, n_win=n_win, k=1024,
        k_blocks=256, threshold_type="rms",
    )
    jax.block_until_ready(out_dev)

    def fetch():
        return [np.asarray(a) for a in out_dev]

    timed("fetch", fetch)

    def fetch1():
        return jax.device_get(out_dev)

    timed("fetch1", fetch1)

    def e2e():
        c = jnp.nan_to_num(plan(data_pad))
        out = batch_candidates(c, caps, swin, 8.0, overlap=0.25,
                               white_noise=wn, k=1024)
        return [np.asarray(a) for a in out]

    dt = timed("e2e", e2e)
    gmacs = n_tp * n_sta * n_comp * n * L / dt / 1e9
    print(f"e2e sustained: {gmacs:.1f} GMAC/s", file=sys.stderr)


if __name__ == "__main__":
    main()
