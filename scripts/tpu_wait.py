#!/usr/bin/env python
"""Block until the accelerator backend initializes and runs a trivial op.

Single-chip TPU workers can wedge after a client is killed mid-compile or
mid-RPC; recovery is automatic but can take tens of minutes, during which
backend init either blocks or raises UNAVAILABLE.  This script is the safe
wait pattern: ONE long-lived process that retries *inside* the process
(`jax.extend.backend.clear_backends()` between attempts) — spawning a new
short-timeout client per attempt can re-wedge the worker.

    python scripts/tpu_wait.py [--interval 120] [--max-wait 3600]

Exits 0 as soon as a (128, 128) matmul completes on the default backend.
"""

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=120.0,
                    help="seconds between retries")
    ap.add_argument("--max-wait", type=float, default=3600.0,
                    help="give up (exit 1) after this many seconds")
    args = ap.parse_args()

    import jax

    t0 = time.time()
    while True:
        try:
            x = jax.numpy.ones((128, 128))
            jax.block_until_ready(x @ x)
            print(f"backend alive after {time.time() - t0:.0f}s "
                  f"({jax.default_backend()})", flush=True)
            return 0
        except Exception as e:  # UNAVAILABLE / init errors while wedged
            waited = time.time() - t0
            msg = " ".join(str(e).split())[:200]
            print(f"[{waited:.0f}s] backend not ready: "
                  f"{type(e).__name__}: {msg}", flush=True)
            if waited > args.max_wait:
                print("giving up", flush=True)
                return 1
            try:
                jax.extend.backend.clear_backends()
            except Exception:
                pass
            time.sleep(args.interval)


if __name__ == "__main__":
    sys.exit(main())
