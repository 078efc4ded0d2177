"""Travel-time table container.

HDF5 file contract identical to the reference and to pykonal-generated
tables (BPMF/template_search.py:30-220): datasets ``tt_<PHASE>/<station>``
with per-source travel times (any grid shape, flattened) and
``source_coordinates/{longitude,latitude,depth}``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pandas as pd

from ..utils.time import sec_to_samp


class TravelTimes:
    """Reference parity: BPMF/template_search.py:30-220."""

    def __init__(self, tt_filename: str, tt_folder_path: str = ""):
        self.where = os.path.join(tt_folder_path, tt_filename)

    # ------------------------------------------------------------------
    @property
    def n_sources(self) -> int:
        return len(self.source_indexes)

    @property
    def phases(self):
        if hasattr(self, "travel_times"):
            return list(self.travel_times.columns)
        if hasattr(self, "travel_times_samp"):
            return list(self.travel_times_samp.columns)
        return None

    @property
    def source_coords(self):
        return self.source_coordinates

    # reference-name aliases (BPMF/template_search.py:57-80)
    @property
    def num_sources(self) -> int:
        return self.n_sources

    @property
    def tts(self):
        if hasattr(self, "travel_times"):
            return self.travel_times
        if hasattr(self, "travel_times_samp"):
            return self.travel_times_samp
        return None

    # ------------------------------------------------------------------
    def read(
        self,
        phases: Sequence[str],
        source_indexes: Optional[np.ndarray] = None,
        read_coords: bool = False,
        stations: Optional[Sequence[str]] = None,
    ) -> "TravelTimes":
        import h5py

        tts = {}
        with h5py.File(self.where, mode="r") as fin:
            grid_shape = fin["source_coordinates"]["depth"].shape
            if source_indexes is None:
                self.source_indexes = np.arange(int(np.prod(grid_shape)))
            else:
                self.source_indexes = np.asarray(source_indexes)
            for ph in phases:
                tts[ph] = {}
                for sta in fin[f"tt_{ph}"].keys():
                    if stations is not None and sta not in stations:
                        continue
                    tts[ph][sta] = (
                        fin[f"tt_{ph}"][sta][()]
                        .reshape(-1)[self.source_indexes]
                        .astype("float32")
                    )
            self.travel_times = pd.DataFrame(tts)
            if read_coords:
                coords = {}
                for coord in fin["source_coordinates"].keys():
                    coords[coord] = (
                        fin["source_coordinates"][coord][()]
                        .reshape(-1)[self.source_indexes]
                    )
                self.source_coordinates = pd.DataFrame(
                    coords, index=self.source_indexes
                )
        return self

    def convert_to_samples(self, sampling_rate: float,
                           remove_tt_seconds: bool = False):
        tts = {}
        for ph in self.travel_times.columns:
            tts[ph] = {}
            for sta in self.travel_times.index:
                tts[ph][sta] = sec_to_samp(
                    self.travel_times.loc[sta, ph], sr=sampling_rate
                )
        self.travel_times_samp = pd.DataFrame(tts)
        self.sampling_rate = sampling_rate
        if remove_tt_seconds:
            del self.travel_times
        return self

    def get_travel_times_array(
        self,
        units: str = "seconds",
        stations: Optional[Sequence[str]] = None,
        phases: Optional[Sequence[str]] = None,
        relative_to_first: bool = False,
    ) -> np.ndarray:
        """(n_sources, n_stations, n_phases) array; with `relative_to_first`
        the per-source earliest arrival is subtracted and kept in
        `self.moveout_to_tt` (for origin-time correction,
        BPMF/template_search.py:212-219)."""
        assert units in ("seconds", "samples")
        attr = (
            self.travel_times if units == "seconds"
            else self.travel_times_samp
        )
        if stations is None:
            stations = list(attr.index)
        if phases is None:
            phases = list(attr.columns)
        dtype = np.asarray(attr.loc[stations[0], phases[0]]).dtype
        tts = np.zeros((self.n_sources, len(stations), len(phases)),
                       dtype=dtype)
        for s, sta in enumerate(stations):
            for p, ph in enumerate(phases):
                tts[:, s, p] = attr.loc[sta, ph]
        if relative_to_first:
            first = np.min(tts, axis=(1, 2), keepdims=True)
            tts = tts - first
            self.moveout_to_tt = first.squeeze()
            if units == "samples":
                self.moveout_to_tt = self.moveout_to_tt / self.sampling_rate
        return tts

    # ------------------------------------------------------------------
    @classmethod
    def from_arrays(cls, tts: dict, source_coordinates: dict
                    ) -> "TravelTimes":
        """Build an in-memory table (no HDF5 file) with the same layout as
        `read(read_coords=True)`.

        tts : {phase: {station: (n_sources,) seconds}}
        source_coordinates : {'longitude','latitude','depth': (n_sources,)}
        """
        self = cls("", "")
        self.travel_times = pd.DataFrame(
            {ph: {s: np.asarray(v, np.float32) for s, v in stas.items()}
             for ph, stas in tts.items()}
        )
        self.source_coordinates = pd.DataFrame(
            {k: np.asarray(v) for k, v in source_coordinates.items()}
        )
        self.source_indexes = np.asarray(self.source_coordinates.index)
        return self

    @staticmethod
    def write_table(
        path: str,
        tts: dict,
        source_coordinates: dict,
    ):
        """Write a travel-time table in the reference HDF5 contract.

        tts : {phase: {station: (n_sources,) seconds}}
        source_coordinates : {'longitude','latitude','depth': (n_sources,)}
        """
        import h5py

        with h5py.File(path, "w") as f:
            g = f.create_group("source_coordinates")
            for k, v in source_coordinates.items():
                g.create_dataset(k, data=np.asarray(v))
            for ph, stations in tts.items():
                gp = f.create_group(f"tt_{ph}")
                for sta, v in stations.items():
                    gp.create_dataset(str(sta), data=np.asarray(v))


def grid_travel_times(
    source_longitudes,
    source_latitudes,
    source_depths,
    receiver_longitudes,
    receiver_latitudes,
    receiver_depths,
    vp_km_s: float = 6.0,
    vs_km_s: float = 3.45,
):
    """Homogeneous-velocity travel-time generator (for tests and quick
    starts; production tables come from an eikonal solver or pykonal with
    the same HDF5 contract).

    Returns {'P': {...}, 'S': {...}} station dictionaries in seconds.
    """
    from ..utils.geo import compute_distances

    d = compute_distances(
        source_longitudes, source_latitudes, source_depths,
        receiver_longitudes, receiver_latitudes, receiver_depths,
    )
    return d / vp_km_s, d / vs_km_s


def load_travel_times(path, phases, source_indexes=None,
                      return_coords=False, stations=None):
    """Function-level travel-time loader (BPMF/utils.py:590-659 API).

    Returns a station-indexed DataFrame with one column per phase, each
    cell holding the flat per-source travel-time vector; with
    `source_indexes`, sources are selected by flat grid index and
    returned in grid order (the reference's boolean-mask semantics).
    The class-based `TravelTimes` container is the framework's native
    interface; this wrapper preserves the reference's functional one.
    """
    import h5py

    with h5py.File(path, "r") as f:
        grid_shape = f["source_coordinates"]["depth"].shape
        mask = None
        sel = None
        if source_indexes is not None:
            # boolean-mask gather returns ascending-unique grid order —
            # make that order explicit so the coords labels below match
            # the gathered values even for unsorted/duplicated inputs
            sel = np.unique(np.asarray(source_indexes))
            mask = np.zeros(grid_shape, dtype=bool)
            mask[np.unravel_index(sel, grid_shape)] = True
        sta_all = sorted(
            {s for ph in phases for s in f[f"tt_{ph}"].keys()}
        )
        rows = [s for s in sta_all if stations is None or s in stations]
        tts = pd.DataFrame(columns=list(phases), index=rows)
        for ph in phases:
            for sta in rows:
                if sta not in f[f"tt_{ph}"]:
                    continue
                v = f[f"tt_{ph}"][sta][()]
                tts.loc[sta, ph] = (
                    v[mask].ravel() if mask is not None else v.ravel()
                )
        if return_coords:
            idx = (sel if sel is not None
                   else np.arange(int(np.prod(grid_shape))))
            coords = pd.DataFrame(
                columns=["longitude", "latitude", "depth"], index=idx
            )
            for c in f["source_coordinates"].keys():
                v = f["source_coordinates"][c][()]
                coords[c] = (v[mask].ravel() if mask is not None
                             else v.ravel())
    if return_coords:
        return tts, coords
    return tts


def get_moveout_array(tts, stations, phases):
    """(n_sources, n_stations, n_phases) array from `load_travel_times`
    output, ordered by `stations`/`phases` (BPMF/utils.py:563-588 API;
    values stay in seconds)."""
    cols = np.stack(
        [np.asarray(tts[ph][sta], dtype=float)
         for sta in stations for ph in phases],
        axis=-1,
    )
    return cols.reshape(-1, len(stations), len(phases))
