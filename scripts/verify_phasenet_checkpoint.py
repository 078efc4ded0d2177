#!/usr/bin/env python
"""One-command real-checkpoint PhaseNet verification.

The Flax `SeisBenchPhaseNet` mirror + weight converter are parity-tested
against a torch mirror (tests/test_seisbench_convert.py), but that pins
the *builder's assumption* of SeisBench's layer layout; a real published
checkpoint cannot be fetched from this offline environment.  The day
network access exists, this script closes the loop in one command:

    # 1. somewhere with network access
    python -c "import seisbench.models as sbm; \
               m = sbm.PhaseNet.from_pretrained('original'); \
               import torch; torch.save(m.state_dict(), 'phasenet_original.pt')"

    # 2. here
    python scripts/verify_phasenet_checkpoint.py phasenet_original.pt --save
    python scripts/verify_phasenet_checkpoint.py phasenet_original.pt

`--save` stores the fixture picks next to this script; without it the run
asserts pick parity against the stored file.  If `seisbench` itself is
importable, the script additionally compares raw class probabilities
against the genuine SeisBench forward pass (max|diff| gate 1e-4).

Reference protocol being verified: the picker callable of
BPMF/dataset.py:1729-1736 fed by `sbm.PhaseNet.from_pretrained`.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def fixture_waveforms(n_windows: int = 4, window: int = 3001,
                      seed: int = 20260817) -> np.ndarray:
    """Deterministic band-limited 3-component fixtures with embedded
    P/S-like onsets (seeded; identical on every machine)."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n_windows, 3, window)).astype(np.float64)
    # smooth to seismic-ish spectra
    k = np.hanning(21)
    k /= k.sum()
    x = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), -1, x)
    t = np.arange(window)
    for w in range(n_windows):
        onset_p = 800 + 310 * w
        onset_s = onset_p + 420
        env_p = np.exp(-((t - onset_p) ** 2) / (2 * 25.0**2))
        env_s = np.exp(-((t - onset_s) ** 2) / (2 * 40.0**2))
        x[w, 2] += 6.0 * env_p * np.sin(2 * np.pi * 0.08 * (t - onset_p))
        x[w, :2] += 8.0 * env_s * np.sin(
            2 * np.pi * 0.05 * (t - onset_s)
        )
    # per-window standardization (SeisBench's norm='std' convention)
    x = x - x.mean(axis=-1, keepdims=True)
    x = x / (x.std(axis=-1, keepdims=True) + 1e-10)
    return x.astype(np.float32)


def picks_from_probas(probas: np.ndarray, p_idx: int, s_idx: int):
    from seismic_bpmf_tpu.ops.picks import find_picks

    out = []
    for w in range(probas.shape[0]):
        row = {}
        for name, idx in (("P", p_idx), ("S", s_idx)):
            v, m, s = find_picks(np.asarray(probas[w, idx]), 0.3)
            row[name] = {
                "probas": np.round(np.asarray(v, float), 4).tolist(),
                "samples": np.round(np.asarray(m, float), 1).tolist(),
            }
        out.append(row)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("checkpoint", help="SeisBench PhaseNet state_dict "
                                       "(.pt/.pth) or .npz export")
    ap.add_argument("--save", action="store_true",
                    help="store this run's picks as the expected fixture")
    ap.add_argument("--expected", default=os.path.join(
        os.path.dirname(__file__), "phasenet_expected_picks.json"))
    ap.add_argument("--tol-samples", type=float, default=1.0,
                    help="max pick-timing deviation vs the fixture")
    args = ap.parse_args()

    import jax

    from seismic_bpmf_tpu.models.phasenet import (
        load_seisbench_checkpoint,
        ps_channels,
    )

    model, variables = load_seisbench_checkpoint(args.checkpoint)
    x = fixture_waveforms()
    # the Flax model is NWC; SeisBench/torch (and the picker protocol)
    # are channels-first
    probas = np.asarray(
        jax.jit(lambda v: model.apply(variables, v))(
            np.transpose(x, (0, 2, 1))
        )
    ).transpose(0, 2, 1)
    p_idx, s_idx = ps_channels(model)
    picks = picks_from_probas(probas, p_idx, s_idx)
    print(f"forward OK: probas shape {probas.shape}, "
          f"sum-to-one max err "
          f"{np.abs(probas.sum(axis=1) - 1.0).max():.2e}")

    rc = 0
    try:
        import seisbench.models as sbm
        import torch

        sb = sbm.PhaseNet()
        sb.load_state_dict(torch.load(args.checkpoint, map_location="cpu",
                                      weights_only=True))
        sb.eval()
        with torch.no_grad():
            want = sb(torch.from_numpy(x)).numpy()
        diff = float(np.abs(probas - want).max())
        print(f"seisbench forward parity: max|diff| = {diff:.2e}")
        if diff > 1e-4:
            print("FAIL: probability mismatch vs seisbench", file=sys.stderr)
            rc = 1
    except ImportError:
        print("seisbench not importable here; skipping direct forward "
              "comparison (pick-fixture check still applies)")

    if args.save:
        with open(args.expected, "w") as fh:
            json.dump(picks, fh, indent=1)
        print(f"saved expected picks -> {args.expected}")
        return rc

    if not os.path.exists(args.expected):
        print(f"no expected-picks fixture at {args.expected}; run once "
              "with --save on a trusted setup", file=sys.stderr)
        return 2

    with open(args.expected) as fh:
        expected = json.load(fh)
    n_bad = 0
    for w, (got, want) in enumerate(zip(picks, expected)):
        for ph in ("P", "S"):
            g, e = got[ph]["samples"], want[ph]["samples"]
            if len(g) != len(e) or any(
                abs(a - b) > args.tol_samples for a, b in zip(g, e)
            ):
                print(f"FAIL window {w} phase {ph}: got {g} want {e}",
                      file=sys.stderr)
                n_bad += 1
    if n_bad:
        return 1
    print(f"pick parity OK ({len(picks)} windows, tol "
          f"{args.tol_samples} samples)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
