"""Observability: structured timing, counters and profiler hooks.

Replaces the reference's ad-hoc `print(f"... {t2-t1:.2f}sec")` wall-clock
instrumentation (SURVEY.md section 5 "Tracing/profiling" row:
BPMF/similarity_search.py:789-806 etc.) with a structured stage-timing
registry and optional `jax.profiler` trace capture.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from collections import defaultdict
from typing import Dict, Optional

logger = logging.getLogger("seismic_bpmf_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    )
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


class StageTimer:
    """Accumulates wall time + counters per named pipeline stage."""

    def __init__(self):
        self.times: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.meters: Dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            dt = time.perf_counter() - t0
            self.times[name] += dt
            self.counts[name] += 1

    def add(self, meter: str, value: float):
        """Accumulate a throughput meter (e.g. samples scanned, detections)."""
        self.meters[meter] += value

    def report(self) -> Dict:
        out = {
            "stages": {
                k: {"seconds": round(v, 4), "calls": self.counts[k]}
                for k, v in self.times.items()
            },
            "meters": dict(self.meters),
        }
        for k, v in self.meters.items():
            # derive rates when a same-named stage exists
            if k in self.times and self.times[k] > 0:
                out["meters"][f"{k}_per_sec"] = v / self.times[k]
        return out

    def log_report(self):
        logger.info("stage report: %s", json.dumps(self.report()))


GLOBAL_TIMER = StageTimer()


@contextlib.contextmanager
def profile_trace(logdir: Optional[str] = None):
    """Capture a `jax.profiler` trace around a pipeline section (viewable in
    TensorBoard/XProf).  No-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
