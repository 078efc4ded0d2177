#!/usr/bin/env python
"""BP kernel precision sweep plus a stage-removal diagnostic mode
(--diag), on a scaled-down headline shape (relative costs are
grid-size-dominated, so a 0.1-day window ranks variants ~50x faster than
a full day).

    python scripts/bp_variants.py [n_src] [n_samp] [--diag] [--cpu]

Variants: highest / high (split2 bf16 ladder).  (The unroll knob was
deleted: Mosaic lowers only unroll=1/full, and full unroll crashes the
compiler — round-4 MF hardware sweep.)
--diag:   high + noroll / noonehot / nosplit / nomask — each removes ONE
          kernel stage, so (baseline - mode) wall time = that stage's
          hardware cost.  Diag beam values are intentionally wrong.
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
        sys.argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from seismic_bpmf_tpu.ops.pallas_bp import PallasBeamformPlan

    n_src = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_samp = int(sys.argv[2]) if len(sys.argv) > 2 else 216_000
    if smoke:
        n_src, n_samp = min(n_src, 2_000), min(n_samp, 20_000)
    n_sta, n_comp, n_ph = 32, 3, 2
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(n_sta, n_comp, n_samp)).astype(np.float32)
    # smooth moveout field (realistic octave locality for the q sweep)
    base = rng.uniform(0, 1, size=(1, n_sta, n_ph))
    ramp = np.linspace(0, 1, n_src)[:, None, None]
    mv = ((base + ramp) * 400).astype(np.int32)
    w_ph = np.zeros((n_sta, n_comp, n_ph), np.float32)
    w_ph[:, 2, 0] = 1.0
    w_ph[:, :2, 1] = 0.5
    w_src = rng.uniform(0.5, 1.0, size=(n_src, n_sta)).astype(np.float32)

    if diag_sweep:
        cells = [("high", d)
                 for d in ("", "noroll", "noonehot", "nosplit", "nomask")]
    else:
        cells = [(p, "") for p in ("high", "highest")]

    for prec, diag in cells:
        label = prec + (f"-diag:{diag}" if diag else "")
        try:
            t0 = time.time()
            plan = PallasBeamformPlan(
                mv, w_ph, w_src, n_samp,
                interpret=(jax.default_backend() == "cpu"),
                precision=prec, diag=diag,
            )
            g = plan.fold_and_pad(feats)

            def run():
                # force completion with a decimated FETCH: through the
                # remote tunnel block_until_ready returns at dispatch
                # (async remote execution), so only materializing bytes
                # on the host proves the program ran
                v, i = plan.call_folded(g)
                return np.asarray(v[::1024])

            run()
            t_compile = time.time() - t0
            times = []
            for _ in range(3):
                t0 = time.time()
                run()
                times.append(time.time() - t0)
            dt = min(times)
            gpts = n_src * n_samp / dt / 1e9
            print(f"{label:22s}: {dt:7.3f} s  {gpts:6.2f} Gpts/s "
                  f"(compile {t_compile:.0f}s)", flush=True)
        except Exception as e:
            print(f"{label:22s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
