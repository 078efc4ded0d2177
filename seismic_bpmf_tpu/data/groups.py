"""Event/template group containers.

Reference parity: `Family`/`EventGroup` (BPMF/dataset.py:4082-4373),
`TemplateGroup` (BPMF/dataset.py:4376-5353) and `Stack`
(BPMF/dataset.py:5356-5677).  These containers assemble the dense batch
arrays the device kernels consume:

  moveouts_arr  : (n_events, n_stations, n_components) int32 samples
  waveforms_arr : (n_events, n_stations, n_components, n_samples) float32

The inter-template CC and the multi-detection dedup (`remove_multiples`)
use the TPU matched-filter kernel instead of FMF.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from ..utils.geo import two_point_distance
from ..utils.stacking import svdwf
from ..utils.time import epoch_from_utc, sec_to_samp, utc_from_epoch
from .events import (
    DEFAULT_OFFSET_PHASE, DEFAULT_PHASE_ON_COMP, Event, Template,
    _to_datetime64,
)
from .network import Network
from .waveforms import get_np_array


class EventGroup:
    """A set of events aligned on a common network (stacking input).

    Reference parity: BPMF/dataset.py:4082-4373.
    """

    def __init__(self, events: Sequence[Event], network: Network):
        self.events = list(events)
        self.network = network

    @property
    def n_events(self):
        return len(self.events)

    @property
    def components(self):
        return list(self.network.components)

    @property
    def stations(self):
        return self.network.stations

    def get_moveouts_arr(self) -> np.ndarray:
        """(n_ev, n_sta, n_comp) int32 samples (phase-on-component)."""
        mv = np.zeros(
            (self.n_events, len(self.stations), len(self.components)),
            np.int32,
        )
        for e, ev in enumerate(self.events):
            from ..utils.time import sec_to_samp

            for c, cp in enumerate(self.components):
                ph = str(ev.aux_data.get(f"phase_on_comp{cp}", "S")).upper()
                col = f"moveouts_{ph}"
                for s, sta in enumerate(self.stations):
                    if sta in ev.moveouts.index:
                        mv[e, s, c] = sec_to_samp(
                            float(ev.moveouts.loc[sta, col]), sr=ev.sr
                        )
        return mv

    def read_waveforms(self, duration: float, **kwargs) -> "EventGroup":
        """Read every event's time-shifted windows (reference parity:
        BPMF/dataset.py `EventGroup.read_waveforms`); kwargs forward to
        `Event.read_waveforms` (offset_phase, phase_on_comp, ...)."""
        for ev in self.events:
            ev.read_waveforms(duration, **kwargs)
        return self

    def get_waveforms_arr(self, **kwargs) -> np.ndarray:
        arrs = []
        for ev in self.events:
            arrs.append(
                get_np_array(
                    ev.traces,
                    self.stations,
                    components=self.components,
                    n_samples=ev.n_samples,
                    verbose=False,
                )
            )
        n = min(a.shape[-1] for a in arrs)
        self.waveforms_arr = np.stack([a[..., :n] for a in arrs])
        return self.waveforms_arr

    def normalize(self, method: str = "rms"):
        """Normalize each event's waveforms (rms or max) in the batch array."""
        arr = self.waveforms_arr
        if method == "rms":
            norm = np.std(arr, axis=-1, keepdims=True)
        elif method == "max":
            norm = np.max(np.abs(arr), axis=-1, keepdims=True)
        else:
            raise ValueError("method must be 'rms' or 'max'")
        norm[norm == 0.0] = 1.0
        self.waveforms_arr = arr / norm
        self._normalize_method = method

    def set_network(self, network: Network):
        """Re-target the group onto a new (e.g. subset) Network, rebuilding
        the batch arrays and re-applying recorded operations.

        Reference parity: BPMF/dataset.py:4172-4203 (`Family.set_network` /
        `_remember`).
        """
        self.network = network
        if hasattr(self, "waveforms_arr"):
            self.get_waveforms_arr()
            if getattr(self, "_normalize_method", None):
                self.normalize(self._normalize_method)
        return self

    def SVDWF_stack(
        self,
        freqmin: float,
        freqmax: float,
        sampling_rate: float,
        expl_var: float = 0.4,
        max_singular_values: int = 5,
    ) -> "Stack":
        """SVD-Wiener-filtered stack -> `Stack` instance.

        Reference parity: BPMF/dataset.py:4275-4373.
        """
        if not hasattr(self, "waveforms_arr"):
            self.get_waveforms_arr()
        n_ev, n_sta, n_comp, n_samp = self.waveforms_arr.shape
        stacked = np.zeros((n_sta, n_comp, n_samp), np.float32)
        for s in range(n_sta):
            for c in range(n_comp):
                matrix = self.waveforms_arr[:, s, c, :]
                if np.allclose(matrix, 0.0):
                    continue
                stacked[s, c] = svdwf(
                    matrix,
                    expl_var=expl_var,
                    max_singular_values=max_singular_values,
                    freqmin=freqmin,
                    freqmax=freqmax,
                    sampling_rate=sampling_rate,
                )
        stack = Stack(
            stacked,
            self.stations,
            self.components,
            sampling_rate=sampling_rate,
            phases=self.events[0].phases,
            moveouts=self.events[0].moveouts.values,
        )
        stack.events = self.events
        return stack


class Stack(Event):
    """An Event wrapping stacked traces (reference:
    BPMF/dataset.py:5356-5677)."""

    def __init__(
        self,
        waveforms: np.ndarray,
        stations,
        components,
        sampling_rate: float,
        phases=("P", "S"),
        moveouts: Optional[np.ndarray] = None,
    ):
        if moveouts is None:
            moveouts = np.zeros((len(stations), len(phases)), np.float32)
        super().__init__(
            np.datetime64("now", "ns"),
            np.asarray(moveouts, np.float32),
            stations,
            phases,
            sampling_rate=sampling_rate,
            components=components,
        )
        from .stream import Stream, Trace

        self.traces = Stream()
        for s, sta in enumerate(stations):
            for c, cp in enumerate(components):
                self.traces += Trace(
                    waveforms[s, c],
                    station=str(sta),
                    channel=f"HH{cp}",
                    sampling_rate=sampling_rate,
                )
        self.duration = waveforms.shape[-1] / sampling_rate
        # keep the full stacked windows: read_waveforms re-slices from
        # them (in-memory source instead of a data file)
        self.stacked_traces = self.traces

    def read_waveforms(
        self,
        duration: float,
        phase_on_comp=DEFAULT_PHASE_ON_COMP,
        offset_phase=DEFAULT_OFFSET_PHASE,
        time_shifted: bool = True,
        offset_ot: float = 10.0,
        **kwargs,
    ):
        """Re-slice phase windows from the stacked traces (reference
        parity: BPMF/dataset.py:5451-5523, with the stack's own time
        base made explicit: the stacked channel for component `c` starts
        `offset_<PH>` seconds before its phase arrival — the EventGroup
        extraction convention, read from aux_data with the default
        pre-pick offsets as fallback).

        `time_shifted=True` trims/pads each channel to the new
        `offset_phase` pre-pick offset; `time_shifted=False` positions
        every window `offset_ot` seconds before the origin time.
        Out-of-range samples are zero-padded.
        """
        from .stream import Stream, Trace

        if not hasattr(self, "stacked_traces"):
            self.stacked_traces = self.traces
        sr = self.sr
        n = int(sec_to_samp(duration, sr=sr))
        out = Stream()
        for sta in self.stations:
            for cp in self.components:
                ph = str(phase_on_comp[cp]).upper()
                orig_off = float(self.aux_data.get(
                    f"offset_{ph}", DEFAULT_OFFSET_PHASE[ph]
                ))
                mv = float(self.moveouts.loc[sta, f"moveouts_{ph}"])
                if time_shifted:
                    rel = orig_off - float(offset_phase[ph])
                else:
                    rel = orig_off - mv - float(offset_ot)
                src = self.stacked_traces.select(station=str(sta),
                                                 component=cp)
                if not src:
                    continue
                x = np.asarray(src[0].data)
                k0 = int(sec_to_samp(rel, sr=sr))
                seg = np.zeros(n, np.float32)
                a0, a1 = max(0, k0), min(len(x), k0 + n)
                if a1 > a0:
                    seg[a0 - k0:a1 - k0] = x[a0:a1]
                out += Trace(seg, station=str(sta), channel=f"HH{cp}",
                             sampling_rate=sr)
        self.traces = out
        self.duration = duration
        self.set_aux_data({
            f"offset_{str(p).upper()}": float(offset_phase[p])
            for p in offset_phase
        })
        self.set_availability(stations=self.stations)
        return self

    def set_arrival_times_from_moveouts(self, offset_ot: float = 0.0):
        """Shift the origin by `offset_ot`, then fill arrivals from the
        moveouts (reference parity: BPMF/dataset.py:5447-5449)."""
        if offset_ot:
            self.origin_time = _to_datetime64(utc_from_epoch(
                self.origin_time_epoch + float(offset_ot)
            ))
        return super().set_arrival_times_from_moveouts()

    def pick_PS_phases_family_mode(
        self,
        duration: float,
        picker,
        threshold_P: float = 0.60,
        threshold_S: float = 0.60,
        **kwargs,
    ):
        """Pick each family member's waveforms and combine the picks.

        Runs the picker on every member event attached via
        `EventGroup.SVDWF_stack` and keeps, per station/phase, the
        probability-weighted mean pick with the spread across members as
        uncertainty.  Reference parity: BPMF/dataset.py:5524-5677.
        """
        import pandas as pd

        if not hasattr(self, "events"):
            raise RuntimeError("no member events attached to this Stack")
        member_picks = []
        for ev in self.events:
            try:
                p = ev.pick_PS_phases(
                    duration, picker, threshold_P=threshold_P,
                    threshold_S=threshold_S, **kwargs,
                )
                member_picks.append(p)
            except Exception:
                continue
        if not member_picks:
            return None
        stations = list(self.stations)
        out = pd.DataFrame(index=pd.Index(stations, name="stations"))
        for ph in ("P", "S"):
            means, uncs, probas = [], [], []
            for sta in stations:
                vals, ws = [], []
                for p in member_picks:
                    if sta in p.index and not pd.isnull(
                        p.loc[sta, f"{ph}_picks"]
                    ):
                        vals.append(float(p.loc[sta, f"{ph}_picks"]))
                        ws.append(float(p.loc[sta, f"{ph}_probas"]))
                if vals:
                    vals, ws = np.asarray(vals), np.asarray(ws)
                    m = float(np.sum(vals * ws) / ws.sum())
                    means.append(m)
                    uncs.append(
                        float(np.sqrt(np.sum(ws * (vals - m) ** 2)
                                      / ws.sum()))
                    )
                    probas.append(float(ws.max()))
                else:
                    means.append(np.nan)
                    uncs.append(np.nan)
                    probas.append(np.nan)
            out[f"{ph}_picks"] = means
            out[f"{ph}_unc"] = uncs
            out[f"{ph}_probas"] = probas
        self.picks = out
        return out


class TemplateGroup:
    """The matched-filter-side fleet container.

    Reference parity: BPMF/dataset.py:4376-5353.
    """

    def __init__(self, templates: Sequence[Template], network: Network):
        self.templates = list(templates)
        self.network = network
        tids = [tp.tid for tp in self.templates]
        self.tids = np.asarray(tids)
        self.tindexes = pd.Series(
            index=self.tids, data=np.arange(len(tids))
        )

    @classmethod
    def read_from_files(cls, filenames: Sequence[str], network: Network,
                        db_path: str = "") -> "TemplateGroup":
        templates = [
            Template.read_from_file(os.path.basename(fn),
                                    db_path=os.path.dirname(fn) or db_path)
            for fn in filenames
        ]
        return cls(templates, network)

    def box(self, lon_min: float, lon_max: float, lat_min: float,
            lat_max: float) -> "TemplateGroup":
        """New TemplateGroup keeping the templates located inside the
        geographic box (reference parity: BPMF/dataset.py
        `TemplateGroup.box`)."""
        kept = [
            tp for tp in self.templates
            if (tp.longitude is not None and tp.latitude is not None
                and lon_min <= tp.longitude <= lon_max
                and lat_min <= tp.latitude <= lat_max)
        ]
        return TemplateGroup(kept, self.network)

    def n_closest_stations(self, n: int, available_stations=None):
        """Per-template n-closest-station lists (reference parity:
        BPMF/dataset.py `TemplateGroup.n_closest_stations`)."""
        return {
            tp.tid: tp.n_closest_stations(n, available_stations)
            for tp in self.templates
        }

    def read_catalog(self, db_path: str = "", extra_attributes=("cc",
                     "n_dev"), **kwargs):
        """Concatenated detection catalog of every template in the group
        (reference parity: BPMF/dataset.py `TemplateGroup.read_catalog`).
        Templates whose detection file is absent contribute nothing."""
        from .catalog import Catalog

        cats = []
        for tp in self.templates:
            try:
                cats.append(tp.read_catalog(
                    db_path=db_path, extra_attributes=extra_attributes,
                    **kwargs,
                ))
            except (OSError, KeyError):
                continue
        if not cats:
            raise FileNotFoundError(
                f"no detection files under {db_path!r} for any template"
            )
        self.catalog = Catalog.concatenate(cats)
        return self.catalog

    def set_network_to_template_map(self):
        """Build the per-template channel-presence map (reference parity:
        BPMF/dataset.py `set_network_to_template_map`; backed by the
        `network_to_template_map` / `availability_arr` properties)."""
        _ = self.network_to_template_map

    def plot_detection(self, row_idx, db_path: str = "", **kwargs):
        """Plot one event of `self.catalog` via the template that
        detected it (reference parity: BPMF/dataset.py:5298-5353)."""
        if not hasattr(self, "catalog"):
            self.read_catalog(db_path=db_path)
        row = self.catalog.catalog.iloc[int(row_idx)]
        tp = self.templates[int(self.tindexes.loc[row["tid"]])]
        ot = row["origin_time"]
        cat_tp = tp.read_catalog(db_path=db_path).catalog
        idx = int(np.argmin(np.abs(
            cat_tp["origin_time"].values - np.datetime64(ot)
        )))
        # detection groups are written under the event id
        # (Template.write_detections), carried as the event_id column
        return tp.plot_detection(str(cat_tp["event_id"].iloc[idx]),
                                 db_path=db_path, **kwargs)

    def plot_recurrence_times(self, db_path: str = "", **kwargs):
        """Recurrence times over the whole group's detections
        (reference parity: BPMF/dataset.py `plot_recurrence_times`)."""
        from ..viz import plot_recurrence_times

        if not hasattr(self, "catalog"):
            self.read_catalog(db_path=db_path)
        return plot_recurrence_times(self.catalog, **kwargs)

    # ------------------------------------------------------------------
    @property
    def n_templates(self):
        return len(self.templates)

    @property
    def stations(self):
        return self.network.stations

    @property
    def components(self):
        return list(self.network.components)

    @property
    def moveouts_arr(self) -> np.ndarray:
        """(n_tp, n_sta, n_comp) int32 samples aligned to the network."""
        if hasattr(self, "_moveouts_arr"):
            return self._moveouts_arr
        n_tp = self.n_templates
        stations = self.stations
        mv = np.zeros((n_tp, len(stations), len(self.components)), np.int32)
        for t, tp in enumerate(self.templates):
            tp_mv = pd.DataFrame(
                tp.moveouts_arr, index=tp.stations,
                columns=self.components,
            )
            common = [s for s in stations if s in tp_mv.index]
            idx = [list(stations).index(s) for s in common]
            mv[t, idx, :] = tp_mv.loc[common].values
        self._moveouts_arr = mv
        return mv

    @property
    def waveforms_arr(self) -> np.ndarray:
        if hasattr(self, "_waveforms_arr"):
            return self._waveforms_arr
        self.read_waveforms()
        return self._waveforms_arr

    @property
    def availability_arr(self) -> np.ndarray:
        """(n_tp, n_sta, n_comp) bool: template channel has data."""
        arr = self.waveforms_arr
        return np.any(arr != 0.0, axis=-1)

    @property
    def network_to_template_map(self) -> np.ndarray:
        """(n_tp, n_sta, n_comp) bool mask of channels present per template.

        Reference parity: BPMF/dataset.py:4977-5008.
        """
        return self.availability_arr

    def read_waveforms(self):
        arrs = []
        for tp in self.templates:
            if not hasattr(tp, "traces"):
                tp.read_waveforms()
            arrs.append(
                get_np_array(
                    tp.traces,
                    self.stations,
                    components=self.components,
                    n_samples=tp.n_samples,
                    verbose=False,
                )
            )
        n = min(a.shape[-1] for a in arrs)
        self._waveforms_arr = np.stack([a[..., :n] for a in arrs]).astype(
            np.float32
        )
        return self._waveforms_arr

    def normalize(self, method: str = "rms"):
        arr = self.waveforms_arr
        if method == "rms":
            norm = np.std(arr, axis=-1, keepdims=True)
        elif method == "max":
            norm = np.max(np.abs(arr), axis=-1, keepdims=True)
        else:
            raise ValueError("method must be 'rms' or 'max'")
        norm[norm == 0.0] = 1.0
        self._waveforms_arr = arr / norm
        self._normalize_method = method

    def set_network(self, network: Network):
        """Re-target the group onto a new (e.g. subset) Network: rebuild the
        cached batch arrays against the new station list and re-apply
        recorded operations (normalization).

        Reference parity: BPMF/dataset.py:4172-4203 (`Family.set_network`).
        """
        had_waveforms = hasattr(self, "_waveforms_arr")
        self.network = network
        for cache in ("_moveouts_arr", "_waveforms_arr", "_intertp_dist",
                      "_dir_errors", "_ellips_dist", "_intertemplate_cc"):
            if hasattr(self, cache):
                delattr(self, cache)
        if had_waveforms:
            self.read_waveforms()
            if getattr(self, "_normalize_method", None):
                self.normalize(self._normalize_method)
        return self

    def n_best_SNR_stations(self, n: int, available_stations=None):
        for tp in self.templates:
            if not hasattr(tp, "_snr"):
                try:
                    tp.compute_snr()
                except Exception:
                    pass
        return {
            tp.tid: (
                tp.n_best_SNR_stations(n, available_stations)
                if hasattr(tp, "_snr")
                else tp.n_closest_stations(n, available_stations)
            )
            for tp in self.templates
        }

    # ------------------------------------------------------------------
    # inter-template similarity and dedup
    # ------------------------------------------------------------------
    @property
    def intertemplate_distances(self) -> pd.DataFrame:
        if hasattr(self, "_intertp_dist"):
            return self._intertp_dist
        lon = np.array([tp.longitude for tp in self.templates], float)
        lat = np.array([tp.latitude for tp in self.templates], float)
        dep = np.array([tp.depth for tp in self.templates], float)
        d = two_point_distance(
            lon[:, None], lat[:, None], dep[:, None],
            lon[None, :], lat[None, :], dep[None, :],
        )
        self._intertp_dist = pd.DataFrame(
            index=self.tids, columns=self.tids, data=d
        )
        return self._intertp_dist

    @property
    def directional_errors(self) -> pd.DataFrame:
        """`directional_errors.loc[i, j]`: 68 %-confidence half-length (km)
        of template i's location-uncertainty ellipsoid along the direction
        from template i to template j.

        Reference parity: BPMF/dataset.py:4594-4663 (`compute_dir_errors`),
        with one divergence noted: direction vectors here live in a
        consistent local km frame, whereas the reference mixes Mercator
        meters (horizontal) with km depths, collapsing every direction to
        the horizontal plane.  Templates without a `cov_mat` fall back to
        an isotropic ellipsoid from their hmax/vmax aux data, then to the
        reference's 15 km default.
        """
        if hasattr(self, "_dir_errors"):
            return self._dir_errors
        s_68_3df = 3.52  # 68 % chi^2 quantile, 3 degrees of freedom
        lon = np.array([tp.longitude for tp in self.templates], float)
        lat = np.array([tp.latitude for tp in self.templates], float)
        dep = np.array([tp.depth for tp in self.templates], float)
        km_per_deg = 2.0 * np.pi * 6371.0 / 360.0
        xyz = np.stack([
            (lon - lon.mean()) * km_per_deg * np.cos(np.deg2rad(lat.mean())),
            (lat - lat.mean()) * km_per_deg,
            dep,
        ], axis=1)
        n = len(self.templates)
        errors = np.zeros((n, n), np.float32)
        for t, tp in enumerate(self.templates):
            u = xyz - xyz[t]
            norm = np.sqrt((u**2).sum(axis=1, keepdims=True))
            u = np.divide(u, norm, out=np.zeros_like(u), where=norm > 0)
            cov = getattr(tp, "cov_mat", None)
            if cov is None:
                cov = tp.aux_data.get("cov_mat")
            if cov is not None:
                cov_dir = np.abs(np.einsum("ji,jk,ki->i", u.T,
                                           np.asarray(cov, float), u.T))
                errors[t] = np.sqrt(s_68_3df * cov_dir)
            else:
                hunc = float(tp.aux_data.get("hmax_unc", 0.0) or 0.0)
                vunc = float(tp.aux_data.get("vmax_unc", 0.0) or 0.0)
                if hunc > 0.0 or vunc > 0.0:
                    errors[t] = np.sqrt(
                        (u[:, 0]**2 + u[:, 1]**2) * hunc**2
                        + u[:, 2]**2 * vunc**2
                    )
                else:
                    errors[t] = 15.0  # reference default (dataset.py:4658)
        self._dir_errors = pd.DataFrame(
            index=self.tids, columns=self.tids, data=errors
        )
        return self._dir_errors

    @property
    def ellipsoid_distances(self) -> pd.DataFrame:
        """Separation between the two templates' uncertainty ellipsoids
        along the inter-template direction — negative when the ellipsoids
        overlap (reference parity: BPMF/dataset.py:4665-4688,
        `compute_ellipsoid_dist`: inter-template distance minus both
        directional errors).
        """
        if hasattr(self, "_ellips_dist"):
            return self._ellips_dist
        de = self.directional_errors
        self._ellips_dist = self.intertemplate_distances - de - de.T
        return self._ellips_dist

    # reference-name aliases (BPMF/dataset.py:4560-4688)
    @property
    def intertemplate_dist(self) -> pd.DataFrame:
        return self.intertemplate_distances

    @property
    def dir_errors(self) -> pd.DataFrame:
        return self.directional_errors

    @property
    def ellipsoid_dist(self) -> pd.DataFrame:
        return self.ellipsoid_distances

    def compute_intertemplate_dist(self):
        # distances feed both derived tables; drop them too
        for cache in ("_intertp_dist", "_dir_errors", "_ellips_dist"):
            self.__dict__.pop(cache, None)
        _ = self.intertemplate_distances

    def compute_dir_errors(self):
        # _ellips_dist = distances - dir_errors - dir_errors.T: a stale
        # separation table must not survive a directional-error refresh
        for cache in ("_dir_errors", "_ellips_dist"):
            self.__dict__.pop(cache, None)
        _ = self.directional_errors

    def compute_ellipsoid_dist(self, refresh_dir_errors: bool = True):
        """Recompute the ellipsoid-separation table.  By default the
        directional errors are refreshed too (template locations or
        uncertainties may have changed since they were cached); pass
        ``refresh_dir_errors=False`` for the reference's behavior of
        reusing the cached `dir_errors` (BPMF/dataset.py:4665-4688)."""
        if refresh_dir_errors:
            self.__dict__.pop("_dir_errors", None)
        self.__dict__.pop("_ellips_dist", None)
        _ = self.ellipsoid_distances

    def compute_intertemplate_cc(
        self,
        distance_threshold: float = 5.0,
        n_stations: int = 10,
        max_lag: int = 10,
        device_step: int = 1,
        cache_file: str = None,
    ) -> pd.DataFrame:
        """Pairwise max-lag-corrected template CC via the TPU matched filter.

        For each template pair within `distance_threshold` (ellipsoid
        distance), slides template 2 across template 1's waveforms within
        +-`max_lag` samples and takes the weighted network CC maximum.
        `cache_file` caches the matrix in HDF5 keyed by a parameter hash
        (recomputed on any parameter or template-set change).
        Reference parity: BPMF/dataset.py:4690-4932 (FMF site 2 + the
        parameter-hash HDF5 cache of :4843-4932).
        """
        from ..ops import matched_filter as mf_op

        cache_key = None
        if cache_file is not None:
            import hashlib

            import h5py

            hsh = hashlib.sha1()
            hsh.update(np.asarray(
                [distance_threshold, n_stations, max_lag, device_step],
                np.float64).tobytes())
            hsh.update(",".join(map(str, self.tids)).encode())
            hsh.update(np.ascontiguousarray(self.moveouts_arr).tobytes())
            cache_key = f"cc_{hsh.hexdigest()[:16]}"
            if os.path.isfile(cache_file):
                with h5py.File(cache_file, "r") as f:
                    if cache_key in f:
                        cc = f[cache_key][()]
                        self._intertemplate_cc = pd.DataFrame(
                            index=self.tids, columns=self.tids, data=cc
                        )
                        return self._intertemplate_cc

        n_tp = self.n_templates
        cc = np.zeros((n_tp, n_tp), np.float32)
        np.fill_diagonal(cc, 1.0)
        ell = self.ellipsoid_distances.values
        wf = self.waveforms_arr  # (n_tp, n_sta, n_comp, n_samp)
        mv = self.moveouts_arr
        n_samp = wf.shape[-1]
        for i in range(n_tp):
            close = np.flatnonzero((ell[i] <= distance_threshold))
            close = close[close > i]
            if close.size == 0:
                continue
            # use template i's waveforms (padded) as "data"; out-of-range
            # moveout differences are handled by the kernel's bounds masks
            data = np.pad(wf[i], ((0, 0), (0, 0), (max_lag, max_lag)))
            templates = wf[close]
            rel_mv = mv[close] - mv[i][None, ...]
            weights = (np.any(templates != 0.0, axis=-1)).astype(np.float32)
            norm = weights.sum(axis=(1, 2), keepdims=True)
            norm[norm == 0] = 1.0
            weights = weights / norm
            ccs = np.asarray(
                mf_op(
                    templates,
                    rel_mv + max_lag,
                    weights,
                    data,
                    step=device_step,
                )
            )  # (n_close, n_lags)
            cc_max = ccs.max(axis=1)
            cc[i, close] = cc_max
            cc[close, i] = cc_max
        if cache_key is not None:
            import h5py

            with h5py.File(cache_file, "a") as f:
                if cache_key in f:
                    del f[cache_key]
                f.create_dataset(cache_key, data=cc)
        self._intertemplate_cc = pd.DataFrame(
            index=self.tids, columns=self.tids, data=cc
        )
        return self._intertemplate_cc

    @property
    def intertemplate_cc(self) -> pd.DataFrame:
        if not hasattr(self, "_intertemplate_cc"):
            self.compute_intertemplate_cc()
        return self._intertemplate_cc

    def remove_multiples(
        self,
        catalog: "pd.DataFrame",
        dt_criterion: float = 3.0,
        distance_criterion: float = 5.0,
        similarity_criterion: float = 0.33,
        ranking_metric: str = "cc",
    ) -> pd.DataFrame:
        """Flag multi-template detections of the same event, keeping the
        detection with the highest `ranking_metric`.

        `catalog` must have columns origin_time (epoch seconds), tid, and the
        ranking metric.  Sequential scan over the time-sorted catalog, as in
        the reference (BPMF/dataset.py:5130-5295).  Returns the catalog with
        a boolean `unique_event` column.
        """
        cat = catalog.sort_values("origin_time").reset_index(drop=True)
        n = len(cat)
        unique = np.ones(n, dtype=bool)
        ell = self.ellipsoid_distances
        try:
            cc = self.intertemplate_cc
            have_cc = True
        except Exception:
            have_cc = False
        times = cat["origin_time"].values.astype(np.float64)
        tids = cat["tid"].values
        metric = cat[ranking_metric].values
        i = 0
        while i < n:
            j = i + 1
            group = [i]
            while j < n and times[j] - times[group[-1]] <= dt_criterion:
                tid_i, tid_j = tids[group[0]], tids[j]
                close = (
                    tid_i == tid_j
                    or (
                        tid_i in ell.index and tid_j in ell.columns
                        and ell.loc[tid_i, tid_j] <= distance_criterion
                    )
                    or (
                        have_cc
                        and tid_i in cc.index and tid_j in cc.columns
                        and cc.loc[tid_i, tid_j] >= similarity_criterion
                    )
                )
                if close:
                    group.append(j)
                j += 1
            if len(group) > 1:
                best = group[int(np.argmax(metric[group]))]
                for g in group:
                    if g != best:
                        unique[g] = False
            i = group[-1] + 1
        cat["unique_event"] = unique
        return cat
