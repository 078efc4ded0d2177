"""Backprojection detection engine.

Reference parity: `Beamformer` (BPMF/template_search.py:398-1333).  The
compute path is the TPU beamform kernel (`ops.beamform` single chip,
`parallel.beamform_sharded` on a mesh); weight policies, detection
extraction and uncertainty quantification mirror the reference.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from ..config import Config, DEFAULT_CONFIG
from ..ops import beamform as beamform_op
from ..ops import bp_detection_threshold
from ..ops.picks import detect_peaks
from ..utils.time import sec_to_samp, utc_from_epoch
from ..data.events import Event


class Beamformer:
    """Holds data + network + phases + travel times; runs backprojection."""

    def __init__(
        self,
        data=None,
        network=None,
        phases: Optional[Sequence[str]] = None,
        travel_times=None,
        moveouts_relative_to_first: bool = True,
        cfg: Config = DEFAULT_CONFIG,
        engine: str = "auto",
        mesh=None,
        precision: str = "high",
    ):
        self.data = data
        self.network = network
        self.phases = list(phases) if phases is not None else None
        self.travel_times = travel_times
        self.moveouts_relative_to_first = moveouts_relative_to_first
        self.cfg = cfg
        self.engine = engine
        self.mesh = mesh
        # 'high' (default) = bf16-split ladder, ~3e-5 beam error at ~2x
        # 'highest' throughput; 'highest' = 6-pass f32 oracle parity;
        # 'default' = single bf16 pass (~2e-2, fastest).  Applies to the
        # Pallas engines; the XLA fallbacks always run f32 HIGHEST.
        self.precision = precision

    # ------------------------------------------------------------------
    @property
    def moveouts(self) -> np.ndarray:
        """(n_src, n_sta, n_ph) int-sample moveouts (reference:
        BPMF/template_search.py:444-454).  Cached — the build loops over
        stations x phases in pandas and allocates the full array (~1 GB at
        1M sources x 128 stations), and backproject/find_detections/
        relocate_beam all read it; set_network/set_phases/
        set_travel_times invalidate."""
        key = (id(self.travel_times), tuple(self.stations),
               tuple(self.phases), self.moveouts_relative_to_first)
        cached = getattr(self, "_moveouts_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        mv = self.travel_times.get_travel_times_array(
            units="samples",
            stations=self.stations,
            phases=self.phases,
            relative_to_first=self.moveouts_relative_to_first,
        )
        self._moveouts_cache = (key, mv)
        return mv

    @property
    def stations(self):
        return self.network.stations

    @property
    def n_stations(self):
        return self.network.n_stations

    @property
    def n_phases(self):
        return len(self.phases)

    @property
    def n_sources(self):
        return self.travel_times.n_sources

    @property
    def num_sources(self):
        # reference-name alias (BPMF/template_search.py:478-483)
        return self.n_sources

    @property
    def source_coordinates(self):
        if hasattr(self, "_source_coordinates"):
            return self._source_coordinates
        return self.travel_times.source_coordinates

    def set_source_coordinates(self, source_coords):
        """Override the source-coordinate table (dict or DataFrame with
        longitude/latitude/depth); reference parity:
        BPMF/template_search.py:753-762."""
        import pandas as pd

        if not isinstance(source_coords, pd.DataFrame):
            source_coords = pd.DataFrame(source_coords)
        self._source_coordinates = source_coords

    # ------------------------------------------------------------------
    def set_data(self, data):
        self.data = data
        self.starttime = data.date

    def set_network(self, network):
        self.network = network
        self._moveouts_cache = None

    def set_phases(self, phases):
        self.phases = list(phases)
        self._moveouts_cache = None

    def set_travel_times(self, travel_times):
        self.travel_times = travel_times
        self._moveouts_cache = None

    def set_weights(self, weights_phases=None, weights_sources=None):
        if weights_phases is not None:
            self.weights_phases = np.asarray(weights_phases, np.float32)
        if weights_sources is not None:
            self.weights_sources = np.asarray(weights_sources, np.float32)

    # ------------------------------------------------------------------
    # source-weight policies (reference: template_search.py:763-949)
    # ------------------------------------------------------------------
    def _operational_stations(self) -> np.ndarray:
        if self.data is not None and hasattr(self.data, "availability_per_sta"):
            return self.data.availability_per_sta.loc[
                list(self.stations)
            ].values.astype(bool)
        return np.ones(self.n_stations, dtype=bool)

    def _weights_sources_closest(self, num_closest_stations: int):
        w = np.ones((self.n_sources, self.n_stations), np.float32)
        operational = self._operational_stations()
        mv = self.moveouts[:, operational, 0]
        k = min(mv.shape[1], num_closest_stations)
        if 0 < k < self.n_stations:
            cutoff = np.max(
                np.partition(mv, k - 1)[:, :k], axis=1, keepdims=True
            )
            w[self.moveouts[:, :, 0] > cutoff] = 0.0
        w[:, ~operational] = 0.0
        return w

    def _weights_sources_max_moveout(self, max_moveout):
        w = np.zeros((self.n_sources, self.n_stations), np.float32)
        operational = self._operational_stations()
        mv = np.min(self.moveouts, axis=-1)
        w[mv < max_moveout] = 1.0
        w[:, ~operational] = 0.0
        return w

    def _station_density_weights(
        self, cutoff_dist=None, lower_percentile=0.0, upper_percentile=100.0
    ):
        """Reference parity: BPMF/template_search.py:897-949."""
        dists = self.network.interstation_distances.values
        if cutoff_dist is None:
            cutoff_dist = np.median(dists[dists != 0.0])
        w = 1.0 / np.sum(np.exp(-(dists**2) / cutoff_dist**2), axis=1)
        if lower_percentile > 0.0:
            w = np.clip(w, np.percentile(w, lower_percentile), w.max())
        if upper_percentile < 100.0:
            w = np.clip(w, w.min(), np.percentile(w, upper_percentile))
        return w.astype(np.float32)

    def set_weights_sources(
        self,
        n_min_stations: int = 0,
        normalize: bool = False,
        weight_station_density: bool = False,
        method: str = "closest_stations",
        **kwargs,
    ):
        if self.data is not None and hasattr(self.data, "traces"):
            self.data.set_availability(list(self.stations))
        if method == "closest_stations":
            w = self._weights_sources_closest(kwargs["num_closest_stations"])
        elif method == "max_moveout":
            w = self._weights_sources_max_moveout(kwargs["max_moveout"])
        else:
            raise ValueError(f"invalid method {method!r}")
        if n_min_stations > 0:
            n_per_src = np.sum(w > 0.0, axis=-1)
            w[n_per_src < n_min_stations, :] = 0.0
        if weight_station_density:
            w *= self._station_density_weights(
                cutoff_dist=kwargs.get("cutoff_dist"),
                lower_percentile=kwargs.get("lower_percentile", 0.0),
                upper_percentile=kwargs.get("upper_percentile", 100.0),
            )[None, :]
        if normalize:
            norm = w.sum(axis=1, keepdims=True)
            norm[norm == 0.0] = 1.0
            w = w / norm
        self.weights_sources = w

    # ------------------------------------------------------------------
    def backproject(
        self,
        waveform_features: np.ndarray,
        reduce: str = "max",
        out_of_bounds: str = "strict",
        **kwargs,
    ):
        """Run the TPU beamform kernel.

        Reference parity: BPMF/template_search.py:508-572 (the `device`
        argument is gone: there is a single jitted path; `engine` and `mesh`
        are construction-time options).
        """
        if not hasattr(self, "weights_phases"):
            raise RuntimeError("set weights_phases first (set_weights)")
        if not hasattr(self, "weights_sources"):
            raise RuntimeError("set weights_sources first")
        engine = kwargs.pop("engine", self.engine)
        if engine == "auto":
            import jax

            engine = (
                "pallas" if jax.default_backend() not in ("cpu",)
                else "onehot"
            )
        if engine == "pallas" and self.mesh is None:
            from ..ops.pallas_bp import PallasBeamformPlan

            import zlib

            n_samp = waveform_features.shape[-1]
            # the plan bakes in moveouts and both weight sets, so the key
            # fingerprints their content — re-running set_weights* (e.g.
            # new availability, new grid) must rebuild, not silently
            # reuse stale device-resident tables
            moveouts = self.moveouts
            content = (
                zlib.crc32(np.ascontiguousarray(moveouts).tobytes()),
                zlib.crc32(
                    np.ascontiguousarray(self.weights_phases).tobytes()
                ),
                zlib.crc32(
                    np.ascontiguousarray(self.weights_sources).tobytes()
                ),
            )
            key = (reduce, out_of_bounds, n_samp, self.precision, content)
            plans = getattr(self, "_pallas_plans", {})
            if key not in plans:
                plans[key] = PallasBeamformPlan(
                    moveouts,
                    self.weights_phases,
                    self.weights_sources,
                    n_samp,
                    reduce=reduce,
                    out_of_bounds=out_of_bounds,
                    precision=self.precision,
                    **kwargs,
                )
                while len(plans) > 4:  # bound device-resident tables
                    plans.pop(next(iter(plans)))
                self._pallas_plans = plans
            out = plans[key](waveform_features)
            if reduce == "max":
                self.maxbeam = np.asarray(out[0])
                self.maxbeam_sources = np.asarray(out[1])
                return self.maxbeam, self.maxbeam_sources
            self.beam = np.asarray(out)
            return self.beam
        if engine == "pallas" and self.mesh is not None:
            from ..parallel import beamform_sharded_pallas

            out = beamform_sharded_pallas(
                waveform_features,
                self.moveouts,
                self.weights_phases,
                self.weights_sources,
                self.mesh,
                reduce=reduce,
                out_of_bounds=out_of_bounds,
                precision=self.precision,
                **kwargs,
            )
            if reduce == "max":
                self.maxbeam = np.asarray(out[0])
                self.maxbeam_sources = np.asarray(out[1])
                return self.maxbeam, self.maxbeam_sources
            self.beam = np.asarray(out)
            return self.beam
        kwargs.setdefault("engine", engine if engine != "pallas" else "onehot")
        if self.mesh is not None:
            from ..parallel import beamform_sharded

            out = beamform_sharded(
                waveform_features,
                self.moveouts,
                self.weights_phases,
                self.weights_sources,
                self.mesh,
                reduce=reduce,
                out_of_bounds=out_of_bounds,
                **kwargs,
            )
        else:
            out = beamform_op(
                waveform_features,
                self.moveouts,
                self.weights_phases,
                self.weights_sources,
                reduce=reduce,
                out_of_bounds=out_of_bounds,
                **kwargs,
            )
        if reduce == "max":
            self.maxbeam = np.asarray(out[0])
            self.maxbeam_sources = np.asarray(out[1])
            return self.maxbeam, self.maxbeam_sources
        self.beam = np.asarray(out)
        return self.beam

    # ------------------------------------------------------------------
    def compute_detection_threshold(
        self, window_sec: float = 3600.0, overlap: float = 0.75,
        num_dev: Optional[float] = None,
    ) -> np.ndarray:
        if num_dev is None:
            num_dev = self.cfg.n_dev_bp_threshold
        window = int(sec_to_samp(window_sec, sr=self.data.sr))
        self.detection_threshold = np.asarray(
            bp_detection_threshold(
                self.maxbeam, window, overlap=overlap, num_dev=num_dev
            )
        )
        return self.detection_threshold

    def find_detections(
        self,
        detection_threshold,
        minimum_interevent_time: float,
        n_max_stations: Optional[int] = None,
        data_reader=None,
    ):
        """Peak-pick the max beam and build Events.

        Reference parity: BPMF/template_search.py:574-673.
        """
        detection_threshold = np.asarray(detection_threshold)
        if detection_threshold.ndim == 0:
            detection_threshold = np.full(
                len(self.maxbeam), float(detection_threshold), np.float32
            )
        self.detection_threshold = detection_threshold
        sr = self.data.sr
        min_iet = int(sec_to_samp(minimum_interevent_time, sr=sr))

        peak_indexes = detect_peaks(self.maxbeam, mpd=min_iet)
        peak_indexes = peak_indexes[
            self.maxbeam[peak_indexes] > detection_threshold[peak_indexes]
        ]
        # keep the largest peak inside each group
        for i in range(len(peak_indexes)):
            lo = max(0, peak_indexes[i] - min_iet // 2)
            hi = min(peak_indexes[i] + min_iet // 2, len(self.maxbeam))
            idx = np.arange(lo, hi)
            upd = np.where(peak_indexes == peak_indexes[i])[0]
            peak_indexes[upd] = idx[np.argmax(self.maxbeam[idx])]
        peak_indexes = np.unique(peak_indexes)
        source_indexes = self.maxbeam_sources[peak_indexes]

        detections = []
        import os

        data_path, data_filename = os.path.split(str(self.data.where))
        for i in range(len(peak_indexes)):
            src_pos = source_indexes[i]
            src_idx = self.source_coordinates.index[src_pos]
            ot = self.data.date_epoch + peak_indexes[i] / sr
            mv = self.moveouts[src_pos].astype(np.float64) / sr
            if hasattr(self.travel_times, "moveout_to_tt"):
                ot = ot - float(self.travel_times.moveout_to_tt[src_pos])
                mv = mv + float(self.travel_times.moveout_to_tt[src_pos])
            if n_max_stations is not None and n_max_stations < len(mv):
                mv_max = np.sort(mv[:, 0])[n_max_stations - 1]
            else:
                mv_max = np.finfo(np.float32).max
            stations_in = np.asarray(self.stations)[mv[:, 0] <= mv_max]
            mv_in = mv[mv[:, 0] <= mv_max]
            event = Event(
                utc_from_epoch(ot),
                mv_in,
                stations_in,
                self.phases,
                data_filename,
                data_path,
                latitude=float(self.source_coordinates["latitude"].loc[src_idx]),
                longitude=float(self.source_coordinates["longitude"].loc[src_idx]),
                depth=float(self.source_coordinates["depth"].loc[src_idx]),
                sampling_rate=sr,
                data_reader=data_reader or getattr(self.data, "data_reader", None),
            )
            event.set_aux_data(
                {
                    "maxbeam": float(self.maxbeam[peak_indexes[i]]),
                    "source_index": int(src_idx),
                }
            )
            detections.append(event)

        self.peak_indexes = peak_indexes
        self.source_indexes = source_indexes
        return detections, peak_indexes, source_indexes

    # ------------------------------------------------------------------
    # maxbeam post-processing (reference: template_search.py:675-701,
    # 951-969, 1402-1415)
    # ------------------------------------------------------------------
    @staticmethod
    def _baseline(x: np.ndarray, window: int) -> np.ndarray:
        """Piecewise-linear curve through windowed minima."""
        from scipy.interpolate import interp1d

        n_windows = int(np.ceil(x.size / window))
        minima = np.zeros(n_windows, dtype=x.dtype)
        minima_args = np.zeros(n_windows, dtype=np.int64)
        for i in range(n_windows):
            seg = x[i * window : (i + 1) * window]
            minima_args[i] = i * window + int(np.argmin(seg))
            minima[i] = x[minima_args[i]]
        interpolator = interp1d(
            minima_args, minima, kind="linear", fill_value="extrapolate"
        )
        return interpolator(np.arange(x.size))

    def remove_baseline(self, window_sec: float, attribute: str = "maxbeam"):
        """Subtract the local-minima baseline (a crude high-pass)."""
        window = int(sec_to_samp(window_sec, sr=self.data.sr))
        x = getattr(self, attribute)
        setattr(self, attribute, x - self._baseline(x, window))

    def smooth_maxbeam(self, window_sec: float):
        """Gaussian smoothing of the max beam."""
        from scipy.ndimage import gaussian_filter1d

        window = int(sec_to_samp(window_sec, sr=self.data.sr))
        self.smoothed = gaussian_filter1d(self.maxbeam, window)
        return self.smoothed

    def return_pd_series(self, attribute: str = "maxbeam"):
        """Attribute as a time-indexed pandas Series."""
        x = getattr(self, attribute)
        index = pd.date_range(
            start=str(self.data.date),
            freq=pd.Timedelta(seconds=1.0 / self.data.sr),
            periods=len(x),
        )
        return pd.Series(data=x, index=index)

    @staticmethod
    def _likelihood(beam_volume: np.ndarray) -> np.ndarray:
        """Min-max normalized beam (reference:
        BPMF/template_search.py:498-506)."""
        rng = beam_volume.max() - beam_volume.min()
        if rng == 0:
            return np.zeros_like(beam_volume)
        lik = (beam_volume - beam_volume.min()) / rng
        return np.clip(lik, 0.0, 1.0)

    def plot_detection(self, detection, duration: float = 60.0,
                       offset_ot: float = 10.0, data_reader=None, **kwargs):
        """Waveform gallery of one detection over the day's max beam
        (reference parity: BPMF/template_search.py:1040-1133)."""
        from ..viz import plot_detection

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
            detection, context=getattr(self, "maxbeam", None),
            context_sr=self.data.sr, context_label="max beam", **kwargs,
        )

    def plot_maxbeam(self, detection_indices=None, **kwargs):
        """Max-beam time series with detections marked (reference parity:
        BPMF/template_search.py 'plot_maxbeam')."""
        from ..viz import plot_maxbeam

        return plot_maxbeam(self, detection_indices=detection_indices,
                            **kwargs)

    def plot_likelihood(self, beam_over_sources: np.ndarray, ax=None,
                        figsize=(10, 8), **kwargs):
        """Source-grid likelihood map (min-max normalized beam) with the
        maximum marked (reference parity:
        BPMF/template_search.py:1135-1200)."""
        import matplotlib.pyplot as plt

        lik = self._likelihood(np.asarray(beam_over_sources))
        src = self.source_coordinates
        if ax is None:
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig = ax.get_figure()
        sc = ax.scatter(
            src["longitude"].values, src["latitude"].values, c=lik,
            s=kwargs.pop("s", 8), cmap=kwargs.pop("cmap", "magma"),
            **kwargs,
        )
        best = int(np.argmax(lik))
        ax.plot(float(src["longitude"].iloc[best]),
                float(src["latitude"].iloc[best]), "*", color="C0",
                ms=14, mec="k")
        fig.colorbar(sc, ax=ax, label="likelihood")
        ax.set_xlabel("Longitude")
        ax.set_ylabel("Latitude")
        return fig

    def _rectangular_domain(self, lon0, lat0, side_km: float = 100.0):
        """Boolean mask of grid sources inside a `side_km` box centered at
        (`lon0`, `lat0`).

        Reference parity: BPMF/template_search.py:1232-1267 — except that
        the reference applies the cos(latitude) shrink factor to the
        latitude difference instead of the longitude difference (swapped
        conversion constants); here longitude degrees are scaled by
        cos(latitude) as geometry dictates.
        """
        r_earth_km = 6371.0
        km_per_deg = 2.0 * np.pi * r_earth_km / 360.0
        km_per_deg_lon = km_per_deg * np.cos(np.deg2rad(lat0))
        lons = self.source_coordinates["longitude"].values
        lats = self.source_coordinates["latitude"].values
        return (
            (np.abs(lons - lon0) * km_per_deg_lon < side_km / 2.0)
            & (np.abs(lats - lat0) * km_per_deg < side_km / 2.0)
        )

    def _compute_location_uncertainty(
        self, event_longitude, event_latitude, event_depth, likelihood,
        domain,
    ):
        """(horizontal, vertical) location uncertainty in km: the
        likelihood-weighted mean epicentral distance / |depth difference|
        from the event over the `domain` sources (boolean mask or index
        array).  Reference parity: BPMF/template_search.py:1269-1333."""
        from ..utils.geo import two_point_epicentral_distance

        src = self.source_coordinates
        lons = src["longitude"].values[domain]
        lats = src["latitude"].values[domain]
        deps = src["depth"].values[domain]
        likelihood = np.asarray(likelihood, np.float64)
        wsum = float(likelihood.sum())
        if wsum <= 0.0 or lons.size == 0:
            return float("inf"), float("inf")
        d_epi = two_point_epicentral_distance(
            event_latitude, event_longitude, lats, lons
        )
        hunc = float(np.sum(likelihood * d_epi) / wsum)
        vunc = float(np.sum(likelihood * np.abs(event_depth - deps)) / wsum)
        return hunc, vunc

    def location_uncertainty(self, beam_over_sources: np.ndarray):
        """Likelihood-weighted RMS distance from the argmax source.

        Reference parity: BPMF/template_search.py:1269-1333.
        """
        from ..utils.geo import two_point_distance

        lik = self._likelihood(beam_over_sources)
        best = int(np.argmax(beam_over_sources))
        src = self.source_coordinates
        d = two_point_distance(
            src["longitude"].values, src["latitude"].values,
            src["depth"].values,
            float(src["longitude"].iloc[best]),
            float(src["latitude"].iloc[best]),
            float(src["depth"].iloc[best]),
        )
        w = lik**2
        if w.sum() == 0:
            return np.inf
        w = w / w.sum()
        return float(np.sqrt(np.sum(w * d**2)))
