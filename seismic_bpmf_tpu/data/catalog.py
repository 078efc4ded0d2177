"""Earthquake catalog container.

Reference parity: `Catalog` (BPMF/dataset.py:298-854): an event table
(longitude/latitude/depth/origin_time + arbitrary extras) with constructors
from Event lists, DataFrames and HDF5 detection databases.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from ..utils.time import epoch_from_utc
from .events import Event


class Catalog:
    def __init__(
        self,
        longitudes,
        latitudes,
        depths,
        origin_times,
        **extra_fields,
    ):
        data = {
            "longitude": np.asarray(longitudes, dtype=np.float64),
            "latitude": np.asarray(latitudes, dtype=np.float64),
            "depth": np.asarray(depths, dtype=np.float64),
            "origin_time": pd.to_datetime(
                list(map(str, origin_times)), format="ISO8601"
            ),
        }
        for k, v in extra_fields.items():
            data[k] = v
        self.catalog = pd.DataFrame(data)
        self.catalog.sort_values("origin_time", inplace=True)
        self.catalog.reset_index(drop=True, inplace=True)

    # ------------------------------------------------------------------
    @property
    def n_events(self) -> int:
        return len(self.catalog)

    @property
    def origin_times_epoch(self) -> np.ndarray:
        return self.catalog["origin_time"].values.astype("int64") / 1e9

    # column-accessor properties (reference parity:
    # BPMF/dataset.py:343-358)
    @property
    def origin_time(self) -> np.ndarray:
        return self.catalog["origin_time"].values

    @property
    def latitude(self) -> np.ndarray:
        return self.catalog["latitude"].values

    @property
    def longitude(self) -> np.ndarray:
        return self.catalog["longitude"].values

    @property
    def depth(self) -> np.ndarray:
        return self.catalog["depth"].values

    def __len__(self):
        return len(self.catalog)

    def __getitem__(self, key):
        return self.catalog[key]

    def event_count(self, start_date=None, end_date=None, freq: str = "1D",
                    **kwargs):
        """Binned seismicity-rate series (`utils.event_count`; the
        reference applies BPMF/utils.py:1501 to catalog timings)."""
        from ..utils import event_count as _event_count

        times = self.catalog["origin_time"]
        if len(times) == 0:
            raise ValueError("event_count on an empty catalog")
        if start_date is None:
            start_date = times.min().floor("D")
        if end_date is None:
            end_date = times.max().ceil("D")
        return _event_count(
            times.dt.strftime("%Y-%m-%dT%H:%M:%S.%f").values,
            str(start_date), str(end_date), freq=freq, **kwargs,
        )

    # ------------------------------------------------------------------
    @classmethod
    def read_from_events(cls, events: Sequence[Event],
                         extra_attributes: Sequence[str] = (),
                         fill_value=np.nan) -> "Catalog":
        """Reference parity: BPMF/dataset.py:383-434."""
        base = {
            "longitudes": [ev.longitude for ev in events],
            "latitudes": [ev.latitude for ev in events],
            "depths": [ev.depth for ev in events],
            "origin_times": [ev.origin_time for ev in events],
        }
        extras: Dict[str, list] = {"event_id": [ev.id for ev in events]}
        for attr in extra_attributes:
            vals = []
            for ev in events:
                if hasattr(ev, attr):
                    vals.append(getattr(ev, attr))
                elif attr in ev.aux_data:
                    vals.append(ev.aux_data[attr])
                else:
                    vals.append(fill_value)
            extras[attr] = vals
        return cls(**base, **extras)

    @classmethod
    def read_from_dataframe(cls, df: pd.DataFrame) -> "Catalog":
        """Reference parity: BPMF/dataset.py:436-458."""
        base_cols = {"longitude", "latitude", "depth", "origin_time"}
        extras = {
            c: df[c].values for c in df.columns if c not in base_cols
        }
        return cls(
            df["longitude"].values,
            df["latitude"].values,
            df["depth"].values,
            df["origin_time"].values,
            **extras,
        )

    @classmethod
    def read_from_detection_file(
        cls,
        filename: str,
        db_path: str = "",
        gid_pattern: str = "*",
        extra_attributes: Sequence[str] = ("cc", "n_dev", "tid"),
        return_events: bool = False,
    ):
        """Read every event group of an HDF5 detection database.

        Reference parity: BPMF/dataset.py:460-580.
        """
        import fnmatch

        import h5py

        events = []
        with h5py.File(os.path.join(db_path, filename), mode="r") as f:
            for gid in f.keys():
                if not fnmatch.fnmatch(gid, gid_pattern):
                    continue
                events.append(
                    Event.read_from_file(hdf5_file=f[gid])
                )
        cat = cls.read_from_events(events, extra_attributes=extra_attributes)
        if return_events:
            return cat, events
        return cat

    @classmethod
    def concatenate(cls, catalogs: Sequence["Catalog"]) -> "Catalog":
        """Reference parity: BPMF/dataset.py:363-381."""
        df = pd.concat([c.catalog for c in catalogs], ignore_index=True)
        return cls.read_from_dataframe(df)

    # ------------------------------------------------------------------
    def flag_multiples(
        self,
        dt_criterion: float = 3.0,
        distance_criterion: float = 5.0,
    ) -> pd.Series:
        """Time+distance multiples flag (single-template-free variant)."""
        from ..utils.geo import two_point_distance

        cat = self.catalog
        t = self.origin_times_epoch
        n = len(cat)
        unique = np.ones(n, dtype=bool)
        for i in range(n):
            if not unique[i]:
                continue
            j = i + 1
            while j < n and t[j] - t[i] <= dt_criterion:
                d = two_point_distance(
                    cat["longitude"].iloc[i], cat["latitude"].iloc[i],
                    cat["depth"].iloc[i],
                    cat["longitude"].iloc[j], cat["latitude"].iloc[j],
                    cat["depth"].iloc[j],
                )
                if d <= distance_criterion:
                    unique[j] = False
                j += 1
        self.catalog["unique_event"] = unique
        return pd.Series(unique)

    def write(self, path: str):
        self.catalog.to_csv(path, index=False)

    @classmethod
    def read(cls, path: str) -> "Catalog":
        return cls.read_from_dataframe(pd.read_csv(path))

    # ------------------------------------------------------------------
    # plots (reference: BPMF/dataset.py:298-854 Catalog plot methods)
    # ------------------------------------------------------------------
    def plot_map(self, network=None, **kwargs):
        from ..viz import plot_catalog

        return plot_catalog(self, network=network, **kwargs)

    def plot_time_statistics(self, **kwargs):
        from ..viz import plot_time_statistics

        return plot_time_statistics(self, **kwargs)

    def plot_time_of_day(self, **kwargs):
        from ..viz import plot_time_of_day

        return plot_time_of_day(self, **kwargs)

    def plot_space_time(self, axis: str = "longitude", **kwargs):
        from ..viz import plot_space_time

        return plot_space_time(self, axis=axis, **kwargs)

    def plot_recurrence_times(self, tid=None, **kwargs):
        from ..viz import plot_recurrence_times

        return plot_recurrence_times(self, tid=tid, **kwargs)
