"""Matched-filter detection engine.

Reference parity: `MatchedFilter` (BPMF/similarity_search.py:22-1028).  The
compute path is the TPU matched-filter kernel (`ops.matched_filter` single
chip, `parallel.matched_filter_sharded` on a mesh); channel-weight policies,
time-dependent thresholding, CC-peak selection, CDF validation and event
extraction mirror the reference.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from ..config import Config, DEFAULT_CONFIG
from ..ops import matched_filter as matched_filter_op
from ..ops import time_dependent_threshold
from ..ops.thresholds import batch_candidates, detect_candidates
from ..ops.cf import scalar_kurtosis
from ..ops.host_ops import dedup_detection_indexes
from ..utils.time import sec_to_samp, utc_from_epoch
from ..data.events import Event

logger = logging.getLogger("seismic_bpmf_tpu.detection.matched_filter")


class MatchedFilter:
    """Runs the template-matching scan and extracts detections."""

    def __init__(
        self,
        template_group,
        min_channels: int = 6,
        min_stations: int = 3,
        max_kurto: float = 100.0,
        remove_edges: bool = True,
        normalize: bool = True,
        max_CC_threshold: float = 0.80,
        threshold_type: str = "rms",
        step: Optional[int] = None,
        max_memory_gb: Optional[float] = None,
        anomalous_cdf_at_mean_plus_1sig: float = 0.0,
        window_for_validation_Tmax: float = 100.0,
        cfg: Config = DEFAULT_CONFIG,
        mesh=None,
        engine: str = "auto",
        precision: str = "high",
        template_chunk: int = 256,
        screen_margin: float = 0.01,
    ):
        self.template_group = template_group
        self.min_channels = min_channels
        self.min_stations = min_stations
        self.max_kurto = max_kurto
        self.remove_edges = remove_edges
        self.normalize = normalize
        self.max_CC_threshold = max_CC_threshold
        self.threshold_type = threshold_type.lower()
        self.step = step if step is not None else max(1, cfg.matched_filter_step_samp)
        self.max_memory_gb = max_memory_gb
        self.anomalous_cdf_at_mean_plus_1sig = anomalous_cdf_at_mean_plus_1sig
        self.window_for_validation_Tmax = window_for_validation_Tmax
        self.cfg = cfg
        self.mesh = mesh
        self.engine = engine
        # 'high' (default) = bf16-split ladder, ~4e-7 CC error at ~2x
        # 'highest' throughput; 'highest' = 6-pass f32 oracle parity;
        # 'default' = single bf16 pass (~2e-4, fastest);
        # 'screen' = scan at 'default' speed, widen candidate extraction
        # by `screen_margin`, then recompute each candidate's CC exactly
        # (float64 host refine) before the threshold decision — detection
        # CC values match 'highest' to oracle precision, only the
        # time-dependent threshold itself carries the screened series'
        # ~2e-4 rounding (a <=0.2% threshold perturbation at 8x deviations).
        # Applies to the Pallas engines; the XLA fallbacks run f32 HIGHEST
        # (screen refine still applies on top).
        self.precision = precision
        self.screen_margin = float(screen_margin)
        # templates per fused-kernel plan: larger chunks amortize the
        # per-channel Hankel build across more templates (VMEM-bounded)
        self.template_chunk = template_chunk

    def _pallas_scan(self, run, templates, moveouts, weights,
                     template_chunk: Optional[int] = None):
        """Run the fused Pallas kernel with per-template-chunk plans cached
        across days (the filter build + transfer happens once per template
        set; only the day's data moves)."""
        import jax.numpy as jnp

        from ..ops.pallas_mf import PallasMatchedFilterPlan

        import jax

        if template_chunk is None:
            template_chunk = self.template_chunk
        n_samp = self.data_arr.shape[-1]
        interpret = jax.default_backend() == "cpu"
        # the filters bake in template waveforms, moveouts AND channel
        # weights, so the cache key must fingerprint their content —
        # availability-driven weight changes between days must rebuild
        import zlib

        content = (
            zlib.crc32(np.ascontiguousarray(templates).tobytes()),
            zlib.crc32(np.ascontiguousarray(moveouts).tobytes()),
            zlib.crc32(np.ascontiguousarray(weights).tobytes()),
        )
        key = (tuple(run.tolist()), n_samp, self.step, self.precision,
               content)
        plans = getattr(self, "_pallas_plans", {})
        # ALL plans — across template chunks AND across the extraction
        # loop's calls — share one padded data geometry derived from the
        # FULL bank's moveout bounds, so each day is padded + uploaded
        # ONCE (a 1024-template campaign otherwise re-uploads the ~260 MB
        # day once per ~120-template extraction chunk: 9x the transfer,
        # measured ~39 s/day of the production loop)
        pad_left, max_mv = self._bank_pad_overrides()
        if key in plans:
            # true LRU: refresh recency on hit so alternating weight
            # epochs (e.g. a campaign flip-flopping between two
            # availability states) don't thrash the eviction below,
            # which drops the first-inserted key
            plans[key] = plans.pop(key)
        else:
            plans[key] = [
                PallasMatchedFilterPlan(
                    templates[i : i + template_chunk],
                    moveouts[i : i + template_chunk],
                    weights[i : i + template_chunk],
                    n_samp,
                    interpret=interpret,
                    # screen: the scan runs at 'default' (single bf16
                    # pass); exactness is restored per candidate by the
                    # host refine in _build_events
                    precision=("default" if self.precision == "screen"
                               else self.precision),
                    pad_left=pad_left, max_moveout=max_mv,
                )
                for i in range(0, len(templates), template_chunk)
            ]
            # bound device-resident filter memory across a campaign whose
            # weights drift day to day: keep ~2 full bank sweeps' worth of
            # plan sets (the extraction loop stripes one sweep over
            # ceil(n_templates/len(templates)) keys)
            n_keys = max(
                4,
                2 * -(-self.template_group.n_templates
                      // max(1, len(templates))),
            )
            while len(plans) > n_keys:
                plans.pop(next(iter(plans)))
            self._pallas_plans = plans
        pad_key = (id(self.data_arr), n_samp,
                   plans[key][0].pad_left, plans[key][0].ext,
                   self._upload_dtype())
        if getattr(self, "_data_pad_key", None) == pad_key:
            data_pad = self._data_pad
        else:
            data_pad = plans[key][0].pad_data(
                self.data_arr, dtype=self._upload_dtype()
            )
            self._data_pad, self._data_pad_key = data_pad, pad_key
        outs = []
        for plan in plans[key]:
            out = plan(data_pad)
            if self.step > 1:
                L = templates.shape[-1]
                out = out[:, :: self.step][
                    :, : (n_samp - L) // self.step + 1
                ]
            outs.append(out)
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def _bank_pad_overrides(self):
        """(pad_left, max_moveout) of the FULL bank — every template-chunk
        plan is built with these overrides so they all consume one padded
        data layout."""
        mv_bank = np.asarray(
            self.template_group.moveouts_arr
        ).reshape(self.template_group.n_templates, -1)
        pad_left = int(-min(0, mv_bank.min(initial=0)))
        max_mv = int(mv_bank.max(initial=0))
        return pad_left, max_mv

    def _use_pallas(self) -> bool:
        """The fused Pallas kernel is the default on accelerators; the
        blocked XLA path serves CPU runs and as a cross-check."""
        if self.engine == "pallas":
            return True
        if self.engine == "auto":
            import jax

            return jax.default_backend() not in ("cpu",)
        return False

    @staticmethod
    def _device_memory_gb() -> float:
        """Per-device HBM capacity in GB, for the auto template-chunk
        bound.  Falls back to 16 GB (v5e) when the backend does not
        expose memory stats (e.g. a tunneled accelerator)."""
        import jax

        try:
            stats = jax.devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit", 0)
            if limit:
                return limit / 1024.0**3
        except Exception:
            pass
        return 16.0

    def _extraction_chunk(self, n_templates: int) -> int:
        """Templates whose CC series may be device-resident at once.

        `max_memory_gb` keeps the reference semantics (GB divided by the
        per-template CC-row size, BPMF/similarity_search.py:726-807).
        When unset on an accelerator, auto-bound instead: the batched
        threshold/top-k extraction program holds ~3 extra f32 copies of
        the chunk's CC stack as HLO temps (pad + layout copy + windowed
        reduce_sum) on top of the stack itself — an unbounded
        1024-template day (1024 x 2.16 M f32 = 8.2 GB/copy) blows a
        16 GB-HBM chip.  Budget a quarter of device memory for the stack
        so stack + temps stay under ~the free half; at v5e (15.75 GB)
        this lands on ~120-template chunks, the measured throughput
        optimum (BENCHMARKS.md round-4 extraction rows)."""
        row_gb = max(self.memory_cc_time_series_gb, 1e-9)
        if self.max_memory_gb is not None:
            chunk = max(1, int(self.max_memory_gb / row_gb))
            if chunk < 2 and n_templates >= 2:
                # the batched threshold/top-k pipeline needs >= 2
                # device-resident CC rows; chunk 1 silently degrades to
                # per-template dispatch+fetch (measured ~20x slower
                # through a tunneled link) — almost always a
                # misconfigured max_memory_gb (e.g. computed from
                # memory_cc_time_series_gb BEFORE set_data, when it is
                # still 0.0)
                logger.warning(
                    "max_memory_gb=%.3g fits %d CC row(s) on device — "
                    "the batched extraction pipeline is disabled and "
                    "the scan runs per-template; raise max_memory_gb "
                    "(one %d-sample row is %.3g GB)",
                    self.max_memory_gb, chunk,
                    int(self.data.duration * self.data.sr / self.step)
                    if hasattr(self, "data") else -1, row_gb,
                )
            return chunk
        if self._use_pallas():
            return max(
                1, int(self._device_memory_gb() / 4.0 / (4.0 * row_gb))
            )
        return n_templates

    # ------------------------------------------------------------------
    @property
    def components(self):
        return self.template_group.components

    @property
    def stations(self):
        return self.template_group.stations

    @property
    def network(self):
        return self.template_group.network

    @property
    def memory_cc_time_series_gb(self) -> float:
        """Per-template CC-series size in GB (reference:
        BPMF/similarity_search.py:153-161)."""
        if not hasattr(self, "data"):
            return 0.0
        nbytes = 4 * int(self.data.duration / (self.step / self.data.sr))
        return nbytes / 1024.0**3

    # ------------------------------------------------------------------
    def _prepare_data_arr(self, data):
        """Host-side of `set_data`: channel extraction + RMS normalization
        (reference: BPMF/similarity_search.py:163-185).  Returns
        (data_arr, data_norm_or_None); touches no engine state, so it is
        safe on a prefetch thread."""
        arr = data.get_np_array(
            self.stations, components=self.components
        ).astype(np.float32)
        norm = None
        if self.normalize:
            norm = np.std(arr, axis=-1, keepdims=True)
            norm[norm == 0.0] = 1.0
            arr = arr / norm
            norm = norm.squeeze(-1)
        return arr, norm

    def _upload_dtype(self) -> str:
        """Day-upload sample dtype.  `screen` ships the day as bf16 and
        casts back to f32 on device — the single-pass scan rounds the
        data to bf16 anyway and detection decisions are re-taken on
        exact host CC, so only the time-dependent threshold keeps the
        extra ~1e-3 rounding (inside the screen margin); the transfer
        (the tunnel-bound campaign cost) halves."""
        return "bfloat16" if self.precision == "screen" else "float32"

    def preupload_day(self, data):
        """Prepare `data` for a later `set_data(data)` call: normalize on
        the calling (prefetch) thread and START the padded device upload,
        so the ~260 MB/day transfer (~7 s over a tunneled link, measured)
        overlaps the previous day's scan instead of stalling this day's
        first chunk.  Single-slot: one day may be in flight at a time
        (`workflow.scan_days` prefetches exactly one)."""
        import weakref

        arr, norm = self._prepare_data_arr(data)
        bundle = {"arr": arr, "norm": norm, "ref": weakref.ref(data)}
        if self.mesh is None and self._use_pallas():
            tg = self.template_group
            n_samp = int(arr.shape[-1])
            L = int(tg.waveforms_arr.shape[-1])
            pad_left, max_mv = self._bank_pad_overrides()
            from ..ops.pallas_mf import (
                PallasMatchedFilterPlan, pad_day_data,
            )

            pad_left, ext = PallasMatchedFilterPlan.data_layout(
                n_samp, L, pad_left, max_mv
            )
            bundle["pad"] = (
                pad_day_data(arr, arr.shape[0] * arr.shape[1], n_samp,
                             pad_left, ext, dtype=self._upload_dtype()),
                (id(arr), n_samp, pad_left, ext, self._upload_dtype()),
            )
        pre = getattr(self, "_preloaded", None)
        if not isinstance(pre, dict):
            pre = {}
        # drop dead entries (their Data was collected unconsumed)
        pre = {k: b for k, b in pre.items() if b["ref"]() is not None}
        pre[id(data)] = bundle
        self._preloaded = pre
        return data

    def set_data(self, data):
        """Attach continuous data; RMS-normalize channels (reference:
        BPMF/similarity_search.py:163-185).  Consumes a pending
        `preupload_day(data)` bundle when one matches."""
        self.data = data
        # a new day invalidates the cached padded device upload (id()
        # alone could be reused by the allocator)
        self._data_pad, self._data_pad_key = None, None
        pre = getattr(self, "_preloaded", None)
        bundle = pre.pop(id(data), None) if isinstance(pre, dict) else None
        if bundle is not None and bundle["ref"]() is data:
            self.data_arr = bundle["arr"]
            if bundle["norm"] is not None:
                self.data_norm = bundle["norm"]
            if "pad" in bundle:
                self._data_pad, self._data_pad_key = bundle["pad"]
            return
        self.data_arr, norm = self._prepare_data_arr(data)
        if norm is not None:
            self.data_norm = norm

    # ------------------------------------------------------------------
    # channel-weight policies (reference: similarity_search.py:288-474)
    # ------------------------------------------------------------------
    def _apply_validity(self, weights: np.ndarray) -> np.ndarray:
        invalid = (
            np.sum(weights != 0.0, axis=(1, 2)) < self.min_channels
        ) | (
            np.sum(np.sum(weights, axis=2) > 0.0, axis=1) < self.min_stations
        )
        weights[invalid] = 0.0
        return weights

    def _weights_channels_simple(self):
        w = np.float32(self.template_group.network_to_template_map)
        return self._apply_validity(w)

    def _weights_channels_closest(self, num_closest_stations: int):
        tg = self.template_group
        w = np.ones(
            (tg.n_templates, self.network.n_stations,
             self.network.n_components),
            np.float32,
        )
        operational = tg.availability_arr.copy()
        if hasattr(self.data, "availability_per_cha"):
            operational &= self.data.availability_per_cha.loc[
                list(self.stations)
            ].values[None, ...]
        op_sta = np.any(operational, axis=-1)
        mv = tg.moveouts_arr[..., 0].astype(np.int64)
        mv = np.where(op_sta, mv, np.iinfo(np.int32).max)
        k = min(mv.shape[1], num_closest_stations)
        if 0 < k < self.network.n_stations:
            cutoff = np.max(
                np.partition(mv, k - 1)[:, :k], axis=1, keepdims=True
            )
            w[tg.moveouts_arr[:, :, 0] > cutoff, :] = 0.0
        w[~operational] = 0.0
        return self._apply_validity(w)

    def _weights_channels_max_moveout(self, max_moveout_sec: float):
        tg = self.template_group
        sr = tg.templates[0].sr
        w = np.zeros(
            (tg.n_templates, self.network.n_stations,
             self.network.n_components),
            np.float32,
        )
        operational = tg.availability_arr.copy()
        if hasattr(self.data, "availability_per_cha"):
            operational &= self.data.availability_per_cha.loc[
                list(self.stations)
            ].values[None, ...]
        op_sta = np.any(operational, axis=-1)
        mv = np.min(tg.moveouts_arr, axis=-1)
        valid = (mv < int(max_moveout_sec * sr)) & op_sta
        w[valid, :] = 1.0
        w[~operational] = 0.0
        return self._apply_validity(w)

    def set_weights_channels(
        self,
        n_min_stations: int = 0,
        normalize: bool = True,
        weight_station_density: bool = False,
        method: str = "simple",
        **kwargs,
    ):
        if method == "simple":
            w = self._weights_channels_simple()
        elif method == "closest_stations":
            w = self._weights_channels_closest(
                kwargs["num_closest_stations"]
            )
        elif method == "max_moveout":
            w = self._weights_channels_max_moveout(kwargs["max_moveout_sec"])
        else:
            raise ValueError(f"invalid method {method!r}")
        if n_min_stations > 0:
            n_sta = np.sum(np.any(w > 0.0, axis=-1), axis=1)
            w[n_sta < n_min_stations, :] = 0.0
        if weight_station_density:
            dists = self.network.interstation_distances.values
            cutoff = kwargs.get("cutoff_dist") or np.median(
                dists[dists != 0.0]
            )
            wd = 1.0 / np.sum(np.exp(-(dists**2) / cutoff**2), axis=1)
            w *= wd[None, :, None].astype(np.float32)
        if normalize:
            norm = w.sum(axis=(1, 2), keepdims=True)
            norm[norm == 0.0] = 1.0
            w = w / norm
        self.weights_channels = w

    # ------------------------------------------------------------------
    def compute_cc_time_series(self, tids=None, n_corr_block: int = 131072):
        """Run the TPU matched filter for (a subset of) the template bank.

        Reference parity: BPMF/similarity_search.py:476-546 (the
        `n_network_chunks` GPU-memory workaround is gone: the kernel blocks
        internally and the mesh shards the template/time axes).
        """
        tg = self.template_group
        if tids is None:
            select = np.arange(tg.n_templates)
        else:
            select = np.asarray(tg.tindexes.loc[tids])
        self.tids_subset = list(tg.tids[select])
        self._weights_arr = self.weights_channels[select]

        invalid = self._weights_arr.sum(axis=(1, 2)) == 0
        run = select[~invalid]
        self.cc = {}
        # drop any previous chunk's stacked CC: when the new subset has
        # no valid templates (e.g. a day-long station outage), a stale
        # stack would otherwise be consumed by the batched extraction
        self._cc_stack = (None, None)
        if len(run) > 0:
            templates = tg.waveforms_arr[run]
            moveouts = tg.moveouts_arr[run]
            weights = self.weights_channels[run]
            if self.mesh is not None:
                if self._use_pallas():
                    from ..parallel import matched_filter_sharded_pallas

                    cc_sums = matched_filter_sharded_pallas(
                        templates, moveouts, weights, self.data_arr,
                        self.mesh, step=self.step,
                        precision=("default"
                                   if self.precision == "screen"
                                   else self.precision),
                    )
                else:
                    from ..parallel import matched_filter_sharded

                    cc_sums = matched_filter_sharded(
                        templates, moveouts, weights, self.data_arr,
                        self.mesh, step=self.step,
                    )
            elif self._use_pallas():
                cc_sums = self._pallas_scan(run, templates, moveouts,
                                            weights)
            else:
                cc_sums = matched_filter_op(
                    templates, moveouts, weights, self.data_arr,
                    step=self.step, n_corr_block=n_corr_block,
                )
            if self._use_pallas():
                import jax.numpy as jnp

                cc_sums = jnp.nan_to_num(jnp.asarray(cc_sums))
                # keep the whole chunk stacked: the batched extraction
                # consumes it directly (slicing rows out and re-stacking
                # costs ~2 device dispatches per template)
                self._cc_stack = ([tg.tids[t] for t in run], cc_sums)
                if not getattr(self, "_defer_rows", False):
                    for i, t in enumerate(run):
                        # rows stay device-resident; detection extraction
                        # pulls only top-k candidates to the host
                        self.cc[tg.tids[t]] = cc_sums[i]
            else:
                cc_sums = np.array(cc_sums)  # writable host copy
                cc_sums[np.isnan(cc_sums)] = 0.0
                for i, t in enumerate(run):
                    self.cc[tg.tids[t]] = cc_sums[i]
        for t in select[invalid]:
            self.cc[tg.tids[t]] = np.zeros(1, np.float32)
        return self.cc

    # ------------------------------------------------------------------
    def select_cc_indexes(
        self, cc_t: np.ndarray, threshold: np.ndarray, search_win: float
    ) -> np.ndarray:
        """Above-threshold peak indexes, deduped within `search_win` and
        validated against the local CC CDF.

        Reference parity: BPMF/similarity_search.py:187-286.
        """
        sr = self.data.sr
        cc_idx = np.flatnonzero(cc_t > threshold - self._margin())
        cc_idx = dedup_detection_indexes(cc_idx, cc_t, search_win)

        if self.anomalous_cdf_at_mean_plus_1sig > 0.0 and len(cc_idx):
            window = int(
                1.0 / self.cfg.min_freq_hz * self.window_for_validation_Tmax
            )
            cc_1sig = threshold / self.cfg.n_dev_mf_threshold
            if self.threshold_type == "mad":
                cc_1sig = cc_1sig * 1.48
            valid = np.ones(len(cc_idx), dtype=bool)
            for i, idx in enumerate(cc_idx):
                lo = max(0, idx - window // 2)
                hi = lo + window
                if hi >= len(cc_t):
                    hi = len(cc_t) - 1
                    lo = hi - window
                half = (hi - lo) // 2
                cc1 = cc_t[lo : lo + half]
                cc2 = cc_t[lo + half : hi]
                frac = min(
                    np.mean(cc1 < cc_1sig[idx]) if len(cc1) else 1.0,
                    np.mean(cc2 < cc_1sig[idx]) if len(cc2) else 1.0,
                )
                if frac < self.anomalous_cdf_at_mean_plus_1sig:
                    valid[i] = False
            cc_idx = cc_idx[valid]

        if self.remove_edges and len(cc_idx):
            det = cc_idx * self.step
            lo = int(sec_to_samp(self.cfg.data_buffer_sec, sr=sr))
            hi = int(
                sec_to_samp(
                    self.data.duration + self.cfg.data_buffer_sec, sr=sr
                )
            )
            keep = (det >= lo) & (det < hi)
            cc_idx = cc_idx[keep]
        return cc_idx

    def _margin(self) -> float:
        """Candidate-extraction widening: nonzero only in screen mode."""
        return self.screen_margin if self.precision == "screen" else 0.0

    def _exact_cc_at(self, tid, tt, cc_idx) -> np.ndarray:
        """Exact network CC at the given CC indexes (float64 host compute,
        ~L*n_ch MACs per lag — microseconds against a day scan).

        Matches the oracle semantics the kernels implement
        (`ops.reference.matched_filter(network_sum=True)`; reference:
        BPMF/similarity_search.py:526-546): per-channel demeaned-template
        correlation over the moveout-shifted window, normalized by the
        window's demeaned L2 norm, weight-summed, with out-of-bounds
        windows contributing zero."""
        from ..ops.reference import matched_filter_at

        tg = self.template_group
        t = self.tids_subset.index(tid)
        return matched_filter_at(
            tg.waveforms_arr[tt], tg.moveouts_arr[tt],
            self._weights_arr[t], self.data_arr, cc_idx, step=self.step,
        )

    @staticmethod
    def _dedup_sparse(cand, vals, search_win):
        """Sequential nearest-pair dedup on sparse candidates (same
        semantics as `ops.reference.dedup_detection_indexes`)."""
        keep = list(range(len(cand)))
        i = 1
        while i < len(keep):
            a, b = keep[i - 1], keep[i]
            if cand[b] - cand[a] < search_win:
                del keep[i - 1 if vals[b] > vals[a] else i]
            else:
                i += 1
        return np.asarray(keep, dtype=np.int64)

    MAX_CANDIDATES = 1024
    MAX_CANDIDATE_BLOCKS = 256

    def _batch_extract(self, white_noise, fetch: bool = True):
        """Threshold + top-k candidate extraction for every device-resident
        CC row of the current chunk in ONE device program and one host
        fetch (the per-template path costs a device->host round trip per
        template, which dominates over a remote/tunneled accelerator).

        With ``fetch=False`` only the device program is dispatched
        (handles stored in `self._cand_pending`); call
        `_batch_extract_collect` later — the device queue then overlaps
        this chunk's extraction with the next chunk's CC scan.

        Returns the white-noise fill actually used (so any fallback path
        sees the same thresholds)."""
        self._cand_cache = {}
        self._cand_pending = None
        if self.anomalous_cdf_at_mean_plus_1sig > 0.0:
            return white_noise
        stack_tids, stack = getattr(self, "_cc_stack", (None, None))
        if (
            stack_tids is not None
            and stack.ndim == 2 and stack.shape[-1] > 1
            and set(stack_tids) <= set(self.tids_subset)
        ):
            # the chunk's device rows, without touching (= materializing)
            # per-row slices of the stack
            dev_tids = list(stack_tids)
        else:
            dev_tids = [
                tid for tid, cc in self.cc.items()
                if not isinstance(cc, np.ndarray) and cc.ndim == 1
                and cc.shape[0] > 1
            ]
        if len(dev_tids) < 2:
            self._materialize_rows()
            return white_noise
        import jax.numpy as jnp

        if white_noise is None and self.threshold_type != "rms":
            # (rms leaves None: the cached RmsExtractionPlan draws — and
            # keys — its fill once per geometry, so day N of a campaign
            # reuses day 1's plan and its device-resident tiled fill;
            # drawing here would change the plan-cache key every day)
            if stack_tids is not None and stack_tids == dev_tids:
                # deferred-row dispatch: rows live only in the stack
                n_noise = int(stack.shape[-1])
            else:
                n_noise = int(self.cc[dev_tids[0]].shape[0])
            white_noise = np.random.normal(size=n_noise).astype(np.float32)
        sr = self.data.sr
        caps = np.array(
            [
                self.max_CC_threshold
                * self._weights_arr[self.tids_subset.index(tid)].sum()
                for tid in dev_tids
            ],
            np.float32,
        )
        stack_tids, stack = getattr(self, "_cc_stack", (None, None))
        cc_in = (stack if stack_tids == dev_tids
                 else jnp.stack([self.cc[tid] for tid in dev_tids]))
        swin = int(sec_to_samp(self.threshold_window_dur, sr=sr))
        eplan = None
        if self.threshold_type == "rms":
            from ..ops.thresholds import _rms_plan

            # a fill we previously got FROM the plan must not round-trip
            # into the module cache's key (its CRC would mint a second
            # entry + a second device-resident tiled fill per geometry):
            # when this call's noise is exactly the last plan's own fill
            # and the geometry is unchanged, reuse that plan directly
            pkey = (int(cc_in.shape[-1]), swin, self.overlap,
                    self.MAX_CANDIDATES, self.MAX_CANDIDATE_BLOCKS)
            if (white_noise is getattr(self, "_rms_plan_noise", None)
                    and getattr(self, "_rms_plan_key", None) == pkey):
                eplan = self._rms_plan_obj
            else:
                eplan = _rms_plan(pkey[0], pkey[1], pkey[2], white_noise,
                                  pkey[3], pkey[4])
            self._rms_plan_obj = eplan
            self._rms_plan_key = pkey
            self._rms_plan_noise = eplan.white_noise
            if not eplan.supported:
                eplan = None
                if white_noise is None:
                    # unsupported-geometry fallback still needs ONE fill
                    # shared between the batched path and any per-row
                    # fallback rows
                    white_noise = np.random.normal(size=500).astype(
                        np.float32)
            else:
                white_noise = eplan.white_noise
        if eplan is not None:
            # packed fused path: the whole chunk's extraction crosses to
            # the host in ONE array fetch (a per-output np.asarray costs
            # a ~25 ms tunnel round trip each).  Packing is exact only
            # below 2^24 samples; longer series fetch the 6-tuple.
            out = eplan.extract(cc_in, caps, self.cfg.n_dev_mf_threshold,
                                margin=self._margin(),
                                pack=eplan.can_pack)
        else:
            out = batch_candidates(
                cc_in,
                caps,
                swin,
                self.cfg.n_dev_mf_threshold,
                overlap=self.overlap,
                white_noise=white_noise,
                k=self.MAX_CANDIDATES,
                k_blocks=self.MAX_CANDIDATE_BLOCKS,
                threshold_type=self.threshold_type,
                margin=self._margin(),
            )
        self._cand_pending = (dev_tids, eplan, out)
        if fetch:
            self._batch_extract_collect()
        return white_noise

    def _materialize_rows(self):
        """Ensure per-tid CC rows exist for paths that read them (deferred
        materialization skips them during pipelined dispatch)."""
        stack_tids, stack = getattr(self, "_cc_stack", (None, None))
        if stack_tids is not None:
            for i, tid in enumerate(stack_tids):
                if tid not in self.cc:
                    self.cc[tid] = stack[i]

    def _batch_extract_collect(self):
        """Fetch a dispatched `_batch_extract` program's results into
        `self._cand_cache`.  Rows where the two-stage extraction's
        block bound failed are left uncached (the per-template device
        path re-extracts them exactly); returns those tids."""
        if self._cand_pending is None:
            return []
        dev_tids, eplan, out = self._cand_pending
        self._cand_pending = None
        if eplan is not None and not isinstance(out, tuple):
            idx, cc_vals, thr_vals, n_above, kurto, blocks_hit = (
                eplan.unpack(out)
            )
        else:
            # unpacked 6-tuple: the non-fused path, or a fused series too
            # long for exact f32 packing (n >= 2^24)
            idx, cc_vals, thr_vals, n_above, kurto, blocks_hit = (
                np.asarray(a) for a in out
            )
        needs_rerun = []
        for j, tid in enumerate(dev_tids):
            if blocks_hit[j] > self.MAX_CANDIDATE_BLOCKS:
                needs_rerun.append(tid)
                continue
            self._cand_cache[tid] = (
                idx[j], cc_vals[j], thr_vals[j], int(n_above[j]),
                float(kurto[j]),
            )
        return needs_rerun

    def _candidates_device(self, tid, cc_dev, weights_t, white_noise,
                           max_candidates=4096):
        """Device-side threshold + top-k candidate extraction: only O(k)
        values cross to the host.  Returns (cand_idx, cc_vals, thr_vals,
        kurto) with candidates sorted by lag, or None to request the host
        fallback (candidate overflow)."""
        cached = getattr(self, "_cand_cache", {}).pop(tid, None)
        if cached is not None:
            idx, cc_vals, thr_vals, n_above, kurto = cached
        else:
            import jax.numpy as jnp

            sr = self.data.sr
            thr = time_dependent_threshold(
                cc_dev,
                int(sec_to_samp(self.threshold_window_dur, sr=sr)),
                self.cfg.n_dev_mf_threshold,
                overlap=self.overlap,
                threshold_type=self.threshold_type,
                white_noise=white_noise,
            )
            thr = jnp.minimum(
                jnp.float32(self.max_CC_threshold * weights_t.sum()), thr
            )
            idx, cc_vals, thr_vals, n_above, kurto = detect_candidates(
                cc_dev, thr, k=max_candidates, margin=self._margin()
            )
        if n_above > len(idx):
            return None
        order = np.argsort(idx[:n_above], kind="stable")
        return (idx[:n_above][order], cc_vals[:n_above][order],
                thr_vals[:n_above][order], kurto)

    def _find_detections_t(self, tid, white_noise=None):
        """Per-template detection extraction (reference:
        BPMF/similarity_search.py:600-724)."""
        tg = self.template_group
        t = self.tids_subset.index(tid)
        tt = int(tg.tindexes.loc[tid])
        sr = self.data.sr
        min_iet = int(sec_to_samp(self.minimum_interevent_time, sr=sr))
        cc_t = self.cc[tid]
        weights_t = self._weights_arr[t]

        device_path = (
            not isinstance(cc_t, np.ndarray)
            and self.anomalous_cdf_at_mean_plus_1sig <= 0.0
        )
        if device_path:
            out = self._candidates_device(tid, cc_t, weights_t, white_noise)
            if out is not None:
                cand, cc_vals, thr_vals, kurto = out
                if self.sanity_check and kurto > self.max_kurto:
                    return []
                d_mv = np.max(tg.moveouts_arr[tt], axis=-1) - np.min(
                    tg.moveouts_arr[tt], axis=-1
                )
                d_mv = int(np.median(d_mv)) + 1
                search_win = min(
                    10 * min_iet, max(d_mv, min_iet)
                ) / self.step
                keep = self._dedup_sparse(cand, cc_vals, search_win)
                cand, cc_vals, thr_vals = (
                    cand[keep], cc_vals[keep], thr_vals[keep]
                )
                if self.remove_edges and len(cand):
                    det = cand * self.step
                    lo = int(sec_to_samp(self.cfg.data_buffer_sec, sr=sr))
                    hi = int(sec_to_samp(
                        self.data.duration + self.cfg.data_buffer_sec, sr=sr
                    ))
                    m = (det >= lo) & (det < hi)
                    cand, cc_vals, thr_vals = cand[m], cc_vals[m], thr_vals[m]
                return self._build_events(
                    tid, tt, cand, cc_vals, thr_vals
                )
            # overflow: fall through to the host path on a fetched series
            cc_t = np.asarray(cc_t)

        cc_t = np.asarray(cc_t)
        if not np.any(cc_t != 0.0):
            return []
        threshold = np.asarray(
            time_dependent_threshold(
                cc_t,
                int(sec_to_samp(self.threshold_window_dur, sr=sr)),
                self.cfg.n_dev_mf_threshold,
                overlap=self.overlap,
                threshold_type=self.threshold_type,
                white_noise=white_noise,
            )
        )
        threshold = np.minimum(
            self.max_CC_threshold * weights_t.sum(), np.asarray(threshold)
        )
        if self.sanity_check and scalar_kurtosis(cc_t) > self.max_kurto:
            return []

        d_mv = np.max(tg.moveouts_arr[tt], axis=-1) - np.min(
            tg.moveouts_arr[tt], axis=-1
        )
        d_mv = int(np.median(d_mv)) + 1
        search_win = min(10 * min_iet, max(d_mv, min_iet)) / self.step
        cc_idx = self.select_cc_indexes(cc_t, threshold, search_win)

        return self._build_events(
            tid, tt, cc_idx, cc_t[cc_idx], threshold[cc_idx]
        )

    def _build_events(self, tid, tt, cc_idx, cc_vals, thr_vals):
        """Instantiate detection Events from selected CC indexes.

        In screen mode this is where exactness is restored: the candidates
        arrived via the margin-widened comparison on the fast single-pass
        CC series, so each one's CC is recomputed exactly here and the
        true-threshold decision is re-taken on the exact value."""
        if self.precision == "screen" and len(cc_idx):
            cc_vals = self._exact_cc_at(tid, tt, cc_idx)
            keep = cc_vals > np.asarray(thr_vals)
            cc_idx = np.asarray(cc_idx)[keep]
            cc_vals = cc_vals[keep]
            thr_vals = np.asarray(thr_vals)[keep]
        tg = self.template_group
        sr = self.data.sr
        template = tg.templates[tt]
        stations = list(self.stations)
        # per-template station-ordered moveout rows: the pandas .loc
        # lookup costs ~1 ms and the bank is fixed for the engine's
        # lifetime, so cache across days
        mv_cache = getattr(self, "_tpl_mv_cache", None)
        if mv_cache is None:
            mv_cache = self._tpl_mv_cache = {}
        mv = mv_cache.get(tt)
        if mv is None:
            mv = mv_cache[tt] = template.moveouts.loc[stations].values
        mv_arr = tg.moveouts_arr[tt]  # (n_sta, n_comp) samples
        data_path, data_filename = os.path.split(str(self.data.where))
        detections = []
        for i, idx in enumerate(cc_idx):
            det_idx = int(idx) * self.step
            ot = self.data.date_epoch + det_idx / sr
            event = Event(
                utc_from_epoch(ot),
                mv,
                stations,
                template.phases,
                data_filename,
                data_path,
                sampling_rate=sr,
                data_reader=getattr(self.data, "data_reader", None),
            )
            event.inherit_location(template)
            aux = {
                "cc": float(cc_vals[i]),
                "n_threshold": float(cc_vals[i] / thr_vals[i]),
                "tid": tid,
            }
            aux["n_dev"] = aux["n_threshold"] * self.cfg.n_dev_mf_threshold
            if getattr(self, "extract_peak_amplitudes", False):
                aux["peak_amplitudes"] = self._peak_amplitudes(
                    det_idx, mv_arr
                )
            event.set_aux_data(aux)
            detections.append(event)
        return detections

    def _peak_amplitudes(
        self, detection_index: int, mv_arr: np.ndarray,
        offset_sec: float = 1.0, duration_sec: float = 3.0,
    ) -> np.ndarray:
        """Peak absolute amplitude per channel in a window around each
        phase arrival (de-normalized to physical units).

        Reference parity: BPMF/similarity_search.py:695-714.
        """
        sr = self.data.sr
        n_off = int(sec_to_samp(offset_sec, sr=sr))
        n_dur = int(sec_to_samp(duration_sec, sr=sr))
        n_sta, n_comp = mv_arr.shape
        peaks = np.zeros((n_sta, n_comp), np.float32)
        for s in range(n_sta):
            for c in range(n_comp):
                i0 = detection_index + int(mv_arr[s, c]) - n_off
                i1 = i0 + n_dur
                win = self.data_arr[s, c, max(0, i0) : max(0, i1)]
                if win.size:
                    peak = float(np.abs(win).max())
                    if self.normalize and hasattr(self, "data_norm"):
                        peak *= float(self.data_norm[s, c])
                    peaks[s, c] = peak
        return peaks

    def find_detections(
        self,
        minimum_interevent_time: float,
        threshold_window_dur: float = 1800.0,
        overlap: float = 0.25,
        sanity_check: bool = True,
        verbose: int = 0,
        white_noise: Optional[np.ndarray] = None,
    ) -> Dict:
        """Reference parity: BPMF/similarity_search.py:548-598."""
        self.minimum_interevent_time = minimum_interevent_time
        self.threshold_window_dur = threshold_window_dur
        self.overlap = overlap
        self.sanity_check = sanity_check
        white_noise = self._batch_extract(white_noise)
        detections = {}
        for tid in list(self.cc.keys()):
            detections[tid] = self._find_detections_t(
                tid, white_noise=white_noise
            )
            if verbose > 0:
                print(f"Template {tid} detected {len(detections[tid])} events.")
        return detections

    # ------------------------------------------------------------------
    def plot_detection(self, detection, duration: float = 60.0,
                       offset_ot: float = 10.0, data_reader=None, **kwargs):
        """Waveform gallery of one detection over its template's CC series
        (reference parity: BPMF/similarity_search.py:922-1020; requires
        the CC series, i.e. `compute_cc_time_series` ran with the series
        kept)."""
        from ..viz import plot_detection

        tid = detection.aux_data.get("tid")
        cc_t = getattr(self, "cc", {}).get(tid)
        if not getattr(detection, "traces", None):
            detection.read_waveforms(
                duration, time_shifted=False, offset_ot=offset_ot,
                data_reader=data_reader or getattr(
                    self.data, "data_reader", None
                ),
            )
        if hasattr(self.data, "date_epoch"):
            detection._context_time = (
                detection.origin_time_epoch - self.data.date_epoch
            )
        return plot_detection(
            detection, context=cc_t, context_sr=self.data.sr,
            context_label=f"network CC (template {tid})", **kwargs,
        )

    def plot_cc(self, tid, ax=None, detection=None, figsize=(15, 7)):
        """CC time series + detection threshold for one template
        (reference parity: BPMF/similarity_search.py:812-900)."""
        import matplotlib.pyplot as plt

        if tid not in getattr(self, "cc", {}):
            raise KeyError(
                f"{tid!r} not in self.cc — run compute_cc_time_series first"
            )
        if ax is None:
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig = ax.get_figure()
        sr = self.data.sr
        cc_t = np.asarray(self.cc[tid])
        # threshold_window_dur/overlap are set by the detection entry
        # points; fall back to their defaults so plot_cc works right
        # after compute_cc_time_series
        threshold = np.asarray(
            time_dependent_threshold(
                cc_t,
                int(sec_to_samp(
                    getattr(self, "threshold_window_dur", 1800.0), sr=sr
                )),
                self.cfg.n_dev_mf_threshold,
                overlap=getattr(self, "overlap", 0.25),
                threshold_type=self.threshold_type,
            )
        )
        t = np.arange(len(cc_t)) / sr
        ax.plot(t, cc_t, lw=0.4, label=f"CC (template {tid})")
        ax.plot(t, threshold, "--", color="C3", label="threshold")
        if detection is not None:
            i = int(
                (detection.origin_time_epoch - self.data.date_epoch) * sr
            ) if hasattr(self.data, "date_epoch") else None
            if i is not None and 0 <= i < len(cc_t):
                ax.plot(t[i], cc_t[i], "o", color="C3", ms=6)
        ax.set_xlabel("Time (s)")
        ax.set_ylabel("Network CC")
        ax.legend(loc="upper right")
        return fig

    def run_matched_filter_search(
        self,
        minimum_interevent_time: float,
        threshold_window_dur: float = 1800.0,
        overlap: float = 0.25,
        sanity_check: bool = True,
        extract_peak_amplitudes: bool = False,
        verbose: int = 0,
        **kwargs,
    ) -> Dict:
        """Full scan with optional template chunking bounded by
        `max_memory_gb` (reference: BPMF/similarity_search.py:726-807).

        On the device path, each chunk's CC scan AND its batched
        threshold/top-k extraction are dispatched back to back before any
        result is fetched, so chunk N's extraction and host fetch overlap
        chunk N+1's scan on the device queue."""
        from time import time as give_time

        self.extract_peak_amplitudes = extract_peak_amplitudes

        tg = self.template_group
        n_chunk = self._extraction_chunk(tg.n_templates)
        detections: Dict = {}
        t_mf = t_det = 0.0

        pipelined = (
            self._use_pallas()
            and self.anomalous_cdf_at_mean_plus_1sig <= 0.0
        )
        if pipelined:
            self.minimum_interevent_time = minimum_interevent_time
            self.threshold_window_dur = threshold_window_dur
            self.overlap = overlap
            self.sanity_check = sanity_check
            white_noise = kwargs.get("white_noise")
            contexts = []
            t0 = give_time()
            # defer per-row CC materialization: the dispatch loop only
            # needs the stacked chunk (each row slice is its own device
            # dispatch; rows regenerate from cached plans on fallback)
            self._defer_rows = True
            for lo in range(0, tg.n_templates, n_chunk):
                tids_chunk = tg.tids[lo : lo + n_chunk]
                self.compute_cc_time_series(tids=tids_chunk)
                white_noise = self._batch_extract(white_noise, fetch=False)
                # keep only host rows (invalid templates) + the pending
                # extraction handles; dropping the device CC references
                # lets each chunk's buffers free right after its
                # extraction program runs
                ctx = {
                    "tids_chunk": list(tids_chunk),
                    "tids_subset": self.tids_subset,
                    "weights": self._weights_arr,
                    "pending": self._cand_pending,
                }
                if self._cand_pending is None:
                    # tiny chunk (<2 device rows): no batch program was
                    # dispatched — keep the full CC dict for the
                    # per-template path
                    ctx["cc_full"] = self.cc
                else:
                    ctx["host_cc"] = {
                        tid: cc for tid, cc in self.cc.items()
                        if isinstance(cc, np.ndarray)
                    }
                contexts.append(ctx)
                self._cand_pending = None
                self.cc = {}
                self._cc_stack = (None, None)
            self._defer_rows = False
            t_mf += give_time() - t0

            t0 = give_time()
            import jax.numpy as jnp

            placeholder = jnp.zeros((2,), jnp.float32)
            for ctx in contexts:
                self.tids_subset = ctx["tids_subset"]
                self._weights_arr = ctx["weights"]
                self._cand_pending = ctx["pending"]
                self._cand_cache = {}
                if "cc_full" in ctx:
                    self.cc = ctx["cc_full"]
                    for tid in list(self.cc.keys()):
                        detections[tid] = self._find_detections_t(
                            tid, white_noise=white_noise
                        )
                    continue
                needs_rerun = set(self._batch_extract_collect())
                overflowed = [
                    tid for tid, c in self._cand_cache.items()
                    if c[3] > len(c[0])
                ]
                if needs_rerun or overflowed:
                    # rare: regenerate this chunk's CC rows (plans are
                    # cached, only the scan reruns) for the exact
                    # re-extraction / host fallback
                    cache = self._cand_cache
                    self.compute_cc_time_series(tids=ctx["tids_chunk"])
                    self._cand_cache = cache
                    for tid in needs_rerun:
                        self._cand_cache.pop(tid, None)
                else:
                    self.cc = {
                        tid: (ctx["host_cc"][tid]
                              if tid in ctx["host_cc"] else placeholder)
                        for tid in ctx["tids_subset"]
                    }
                for tid in list(self.cc.keys()):
                    detections[tid] = self._find_detections_t(
                        tid, white_noise=white_noise
                    )
                    if verbose > 0:
                        print(f"Template {tid} detected "
                              f"{len(detections[tid])} events.")
            t_det += give_time() - t0
        else:
            for lo in range(0, tg.n_templates, n_chunk):
                tids_chunk = tg.tids[lo : lo + n_chunk]
                t0 = give_time()
                self.compute_cc_time_series(tids=tids_chunk)
                t_mf += give_time() - t0
                t0 = give_time()
                detections.update(
                    self.find_detections(
                        minimum_interevent_time,
                        threshold_window_dur=threshold_window_dur,
                        overlap=overlap,
                        sanity_check=sanity_check,
                        verbose=verbose,
                        white_noise=kwargs.get("white_noise"),
                    )
                )
                t_det += give_time() - t0
        if verbose > -1:
            print(f"Total time computing CCs: {t_mf:.2f}s")
            print(f"Total time finding detections: {t_det:.2f}s")
        return detections
