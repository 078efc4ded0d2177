"""Visualization (matplotlib; cartopy optional).

Reference parity: BPMF/plotting_utils.py (734 LoC) + the plot_* methods on
the data classes.  Maps use cartopy when available and degrade to plain
lon/lat axes otherwise.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAS_MPL = True
except Exception:  # pragma: no cover
    HAS_MPL = False

try:
    import cartopy.crs as ccrs

    HAS_CARTOPY = True
except Exception:
    HAS_CARTOPY = False


def initialize_map(
    map_longitudes,
    map_latitudes,
    figsize=(12, 8),
    map_axis=None,
    seismic_stations: Optional[dict] = None,
    **kwargs,
):
    """Map axes with optional station markers.

    Reference parity: BPMF/plotting_utils.py:126-260 (cartopy path) with a
    plain-axes fallback when cartopy is unavailable.
    """
    if map_axis is None:
        fig = plt.figure(figsize=figsize)
        if HAS_CARTOPY:
            map_axis = fig.add_subplot(111, projection=ccrs.PlateCarree())
            map_axis.coastlines()
        else:
            map_axis = fig.add_subplot(111)
            map_axis.set_xlabel("Longitude")
            map_axis.set_ylabel("Latitude")
    map_axis.set_xlim(map_longitudes)
    map_axis.set_ylim(map_latitudes)
    if seismic_stations is not None:
        map_axis.scatter(
            seismic_stations["longitude"],
            seismic_stations["latitude"],
            marker="^", c="k", s=60, zorder=5,
        )
        for lon, lat, name in zip(
            seismic_stations["longitude"],
            seismic_stations["latitude"],
            seismic_stations.get("stations", []),
        ):
            map_axis.annotate(str(name), (lon, lat), fontsize=7,
                              xytext=(2, 2), textcoords="offset points")
    return map_axis


def plot_template(template, figsize=(12, 8), **kwargs):
    """Waveform gallery of a template (reference:
    BPMF/plotting_utils.py:23-124 / dataset plot methods)."""
    arr = template.waveforms_arr
    n_sta, n_comp, _ = arr.shape
    fig, axes = plt.subplots(
        n_sta, n_comp, figsize=figsize, sharex=True, squeeze=False
    )
    t = np.arange(arr.shape[-1]) / template.sr
    for s in range(n_sta):
        for c in range(n_comp):
            axes[s, c].plot(t, arr[s, c], lw=0.6, color="k")
            axes[s, c].set_ylabel(
                f"{template.stations[s]}.{template.components[c]}",
                fontsize=7,
            )
    axes[-1, 0].set_xlabel("Time (s)")
    fig.suptitle(f"Template {getattr(template, 'tid', template.id)}")
    return fig


def plot_detection_matrix(
    detections_arr,
    stations: Sequence[str],
    sr: float,
    figsize=(10, 8),
    **kwargs,
):
    """Stacked single-channel waveforms of a set of detections (reference:
    BPMF/plotting_utils.py:261-332)."""
    fig, ax = plt.subplots(figsize=figsize)
    t = np.arange(detections_arr.shape[-1]) / sr
    for i, row in enumerate(detections_arr):
        denom = np.abs(row).max() or 1.0
        ax.plot(t, i + row / (2.0 * denom), lw=0.5, color="k")
    ax.set_xlabel("Time (s)")
    ax.set_ylabel("Detection #")
    return fig


def plot_catalog(catalog, figsize=(12, 10), network=None, **kwargs):
    """Map + time series + magnitude views of a catalog (reference:
    BPMF/plotting_utils.py:333-512 / Catalog plot methods)."""
    df = catalog.catalog
    fig = plt.figure(figsize=figsize)
    ax_map = fig.add_subplot(211)
    sc = ax_map.scatter(
        df["longitude"], df["latitude"],
        c=np.arange(len(df)), s=12, cmap="viridis",
    )
    if network is not None:
        ax_map.scatter(network.longitude, network.latitude, marker="^",
                       c="k", s=50)
    ax_map.set_xlabel("Longitude")
    ax_map.set_ylabel("Latitude")
    fig.colorbar(sc, ax=ax_map, label="event #")
    ax_t = fig.add_subplot(212)
    ax_t.plot(df["origin_time"], np.arange(len(df)), drawstyle="steps-post")
    ax_t.set_xlabel("Origin time")
    ax_t.set_ylabel("Cumulative events")
    fig.autofmt_xdate()
    return fig


def plot_maxbeam(beamformer, detection_indices=None, figsize=(14, 5)):
    """Max beam + detection threshold (reference:
    BPMF/template_search.py:974-1017)."""
    fig, ax = plt.subplots(figsize=figsize)
    ax.plot(beamformer.maxbeam, lw=0.5, label="max beam")
    if hasattr(beamformer, "detection_threshold"):
        ax.plot(beamformer.detection_threshold, "--", color="C3",
                label="detection threshold")
    if detection_indices is not None:
        ax.plot(detection_indices, beamformer.maxbeam[detection_indices],
                "o", color="C3", ms=4, label="detections")
    ax.set_xlabel("Sample")
    ax.set_ylabel("Beam")
    ax.legend(loc="upper right")
    return fig


def uncertainty_ellipse(event, ax=None, n_points: int = 100, **kwargs):
    """Horizontal uncertainty ellipse from the event covariance (reference:
    BPMF/plotting_utils.py:607-734)."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    hmax = event.hmax_unc
    hmin = event.hmin_unc
    az = np.radians(event.az_hmax_unc)
    theta = np.linspace(0, 2 * np.pi, n_points)
    # ellipse in km, converted to degrees (rough local scaling)
    km_per_deg_lat = 111.19
    km_per_deg_lon = 111.19 * np.cos(np.radians(event.latitude or 0.0))
    ex = hmax * np.sin(az) * np.cos(theta) + hmin * np.cos(az) * np.sin(theta)
    ey = hmax * np.cos(az) * np.cos(theta) - hmin * np.sin(az) * np.sin(theta)
    ax.plot(
        event.longitude + ex / km_per_deg_lon,
        event.latitude + ey / km_per_deg_lat,
        **{"color": "C3", "lw": 1.0, **kwargs},
    )
    return ax


def load_topography(path: str, map_longitudes, map_latitudes):
    """Load a topography grid for map backgrounds.

    Reference parity: BPMF/plotting_utils.py `load_topography` (netCDF
    grids).  Requires the optional `netCDF4` package; returns
    (longitudes, latitudes, elevation 2-D array) cropped to the map extent.
    """
    try:
        import netCDF4
    except ImportError as e:
        raise ImportError(
            "load_topography requires the optional netCDF4 package"
        ) from e

    with netCDF4.Dataset(path) as ds:
        names = list(ds.variables)
        lon_name = next(n for n in ("lon", "longitude", "x") if n in names)
        lat_name = next(n for n in ("lat", "latitude", "y") if n in names)
        z_name = next(
            n for n in ("z", "elevation", "Band1") if n in names
        )
        lon = ds.variables[lon_name][:]
        lat = ds.variables[lat_name][:]
        sel_lon = (lon >= map_longitudes[0]) & (lon <= map_longitudes[1])
        sel_lat = (lat >= map_latitudes[0]) & (lat <= map_latitudes[1])
        z = ds.variables[z_name][sel_lat, :][:, sel_lon]
        return lon[sel_lon], lat[sel_lat], np.asarray(z)
