"""Seismic network metadata.

File contract identical to the reference (BPMF/dataset.py:109-129): a text
file whose first line is "<start_date> <end_date>", second line the component
codes, followed by a tab-separated table with columns including
`station_code`, `network_code`, `elevation_m`, `latitude`, `longitude`.

Geodesy uses a vectorized WGS84 Vincenty/haversine implementation
(`utils.geo`) instead of cartopy.
"""

from __future__ import annotations

import copy
import os
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from ..utils.geo import geodesic_distance_km


class Network:
    """Station metadata table (reference parity: BPMF/dataset.py:26-295)."""

    def __init__(self, network_file: str, network_path: str = ""):
        self.where = os.path.join(network_path, network_file)

    # ------------------------------------------------------------------
    @classmethod
    def from_dataframe(cls, metadata: pd.DataFrame, components=("N", "E", "Z"),
                       start_date=None, end_date=None) -> "Network":
        """Build a Network directly from a dataframe with columns
        stations, networks, latitude, longitude, elevation_m[, depth_km]."""
        net = cls.__new__(cls)
        net.where = "<memory>"
        metadata = metadata.copy()
        if "depth_km" not in metadata.columns:
            metadata["depth_km"] = -metadata["elevation_m"] / 1000.0
        net.metadata = metadata
        if net.metadata.index.name != "stations":
            net.metadata.set_index("stations", inplace=True, drop=False)
        net.components = list(components)
        net.start_date = start_date
        net.end_date = end_date
        return net

    def read(self) -> "Network":
        with open(self.where, "r") as fin:
            line1 = fin.readline().strip().split()
            self.start_date = np.datetime64(line1[0])
            self.end_date = np.datetime64(line1[1])
            self.components = fin.readline().strip().split()
        metadata = pd.read_csv(self.where, sep="\t", skiprows=2)
        metadata = metadata.rename(
            columns={"station_code": "stations", "network_code": "networks"}
        )
        metadata["depth_km"] = -1.0 * metadata["elevation_m"] / 1000.0
        self.metadata = metadata
        self.metadata.set_index("stations", inplace=True, drop=False)
        return self

    def write(self, path: Optional[str] = None):
        """Write the reference-format network file."""
        path = path or self.where
        with open(path, "w") as f:
            f.write(f"{self.start_date} {self.end_date}\n")
            f.write(" ".join(self.components) + "\n")
            df = self.metadata.rename(
                columns={"stations": "station_code", "networks": "network_code"}
            )
            cols = [c for c in ["station_code", "network_code", "latitude",
                                "longitude", "elevation_m"] if c in df.columns]
            df[cols].to_csv(f, sep="\t", index=False)

    # ------------------------------------------------------------------
    @property
    def n_stations(self) -> int:
        return len(self.stations)

    @property
    def n_components(self) -> int:
        return len(self.components)

    @property
    def stations(self) -> np.ndarray:
        return self.metadata["stations"].values.astype("U")

    @property
    def station_indexes(self) -> pd.Series:
        return pd.Series(index=self.stations, data=np.arange(self.n_stations))

    def stations_idx(self, stations):
        """Integer indexes of `stations` (str or sequence) in this network
        (reference parity: BPMF/dataset.py:131-139, whose body returns an
        undefined variable; here the looked-up indexes are returned)."""
        if isinstance(stations, str):
            stations = [stations]
        return self.station_indexes.loc[list(stations)].values

    @property
    def networks(self) -> np.ndarray:
        return self.metadata["networks"].values.astype("U")

    @property
    def latitude(self) -> np.ndarray:
        return self.metadata["latitude"].values.astype("float64")

    @property
    def longitude(self) -> np.ndarray:
        return self.metadata["longitude"].values.astype("float64")

    @property
    def depth(self) -> np.ndarray:
        return self.metadata["depth_km"].values.astype("float64")

    @property
    def elevation(self) -> np.ndarray:
        return self.metadata["elevation_m"].values.astype("float64")

    def datelist(self):
        return pd.date_range(start=str(self.start_date), end=str(self.end_date))

    # ------------------------------------------------------------------
    def box(self, lat_min, lat_max, lon_min, lon_max) -> "Network":
        sel = (
            (self.latitude > lat_min)
            & (self.latitude < lat_max)
            & (self.longitude > lon_min)
            & (self.longitude < lon_max)
        )
        return self.subset(list(self.stations[sel]), self.components, "keep")

    def subset(self, stations, components, method: str = "keep") -> "Network":
        sub = copy.deepcopy(self)
        stations = list(np.atleast_1d(stations))
        components = list(np.atleast_1d(components))
        if method == "keep":
            sub.metadata = sub.metadata.loc[stations]
            sub.components = components
        elif method == "discard":
            sub.metadata = sub.metadata.drop(stations, axis="rows")
            sub.components = [c for c in sub.components if c not in components]
        else:
            raise ValueError("method should be 'keep' or 'discard'")
        return sub

    def plot_map(self, margin_deg: float = 0.2, **kwargs):
        """Station map (reference: BPMF/dataset.py:234-295)."""
        from ..viz import initialize_map

        return initialize_map(
            (float(self.longitude.min()) - margin_deg,
             float(self.longitude.max()) + margin_deg),
            (float(self.latitude.min()) - margin_deg,
             float(self.latitude.max()) + margin_deg),
            seismic_stations={
                "longitude": self.longitude,
                "latitude": self.latitude,
                "stations": list(self.stations),
            },
            **kwargs,
        )

    # ------------------------------------------------------------------
    @property
    def interstation_distances(self) -> pd.DataFrame:
        """Hypocentral-style distances (km) between all station pairs."""
        if (
            hasattr(self, "_interstation_distances")
            and self._interstation_distances.shape[0] == self.n_stations
        ):
            return self._interstation_distances
        d_epi = geodesic_distance_km(
            self.longitude[:, None], self.latitude[:, None],
            self.longitude[None, :], self.latitude[None, :],
        )
        d = np.sqrt(d_epi**2 + (self.depth[:, None] - self.depth[None, :]) ** 2)
        self._interstation_distances = pd.DataFrame(
            index=self.stations, columns=self.stations, data=d
        )
        return self._interstation_distances
