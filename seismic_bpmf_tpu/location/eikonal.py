"""JAX eikonal solver for travel-time table generation.

The reference generates its travel-time tables offline with pykonal (Cython
fast-marching, 4_travel_times.ipynb); this module computes them on device
with a Jacobi/Gauss-Seidel-free iterative upwind scheme (parallel fast
sweeping), which maps naturally onto the TPU's data-parallel model: every
grid node relaxes simultaneously

    T[i] = min(T[i], min_over_axes(godunov_update(T_neighbors, h / v)))

until a fixed point.  The output feeds `TravelTimes.write_table` with the
same HDF5 contract the reference consumes.

For regional grids (~100^3 nodes) a few hundred sweeps converge to
sub-millisecond travel-time accuracy — amply sufficient for beamforming
moveouts quantized to 25-Hz samples.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_iters",))
def _eikonal_sweeps(slowness, t0, h, n_iters: int = 300):
    """Iterative Godunov upwind relaxation of |grad T| = s on a regular grid.

    slowness : (nx, ny, nz) s/km; t0 : initial times (inf except sources);
    h : grid spacing in km.
    """
    big = jnp.float32(1e6)

    def axis_mins(t):
        out = []
        for ax in range(3):
            lo = jnp.concatenate(
                [jax.lax.slice_in_dim(t, 0, 1, axis=ax),
                 jax.lax.slice_in_dim(t, 0, t.shape[ax] - 1, axis=ax)],
                axis=ax,
            )
            hi = jnp.concatenate(
                [jax.lax.slice_in_dim(t, 1, t.shape[ax], axis=ax),
                 jax.lax.slice_in_dim(t, t.shape[ax] - 1, t.shape[ax],
                                      axis=ax)],
                axis=ax,
            )
            out.append(jnp.minimum(lo, hi))
        return out  # [a, b, c] per axis

    def update(t, _):
        a, b, c = axis_mins(t)
        # sort (a, b, c) ascending (median via min/max, no arithmetic --
        # a sum-based median catastrophically cancels against the huge
        # unvisited-node sentinel in float32)
        lo = jnp.minimum(jnp.minimum(a, b), c)
        hi = jnp.maximum(jnp.maximum(a, b), c)
        mid = jnp.maximum(jnp.minimum(a, b),
                          jnp.minimum(jnp.maximum(a, b), c))
        f = slowness * h
        # Godunov update with 1, 2, then 3 operands
        t1 = lo + f
        # 2-operand: solve (t-lo)^2 + (t-mid)^2 = f^2
        s2 = lo + mid
        disc2 = 2.0 * f * f - (lo - mid) ** 2
        t2 = jnp.where(
            (t1 > mid) & (disc2 > 0),
            0.5 * (s2 + jnp.sqrt(jnp.maximum(disc2, 0.0))),
            t1,
        )
        # 3-operand
        s3 = lo + mid + hi
        disc3 = s3 * s3 - 3.0 * (lo * lo + mid * mid + hi * hi - f * f)
        t3 = jnp.where(
            (t2 > hi) & (disc3 > 0),
            (s3 + jnp.sqrt(jnp.maximum(disc3, 0.0))) / 3.0,
            t2,
        )
        return jnp.minimum(t, t3), None

    t, _ = jax.lax.scan(update, t0, None, length=n_iters)
    return t


def travel_time_grid(
    velocity_km_s: np.ndarray,
    source_index: Tuple[int, int, int],
    spacing_km: float,
    n_iters: int = 300,
    source_ball_nodes: float = 4.0,
) -> np.ndarray:
    """First-arrival travel times (s) from one source node on a regular grid.

    velocity_km_s : (nx, ny, nz) velocity model.

    Nodes within `source_ball_nodes` grid steps of the source are
    initialized with the analytic homogeneous-medium time
    dist * slowness(source) — the dominant error of first-order upwind
    schemes is the source singularity, and seeding a small analytic ball
    removes most of it (the same device-parallel relaxation then only
    refines an already-causal upper bound, so accuracy can only improve).
    """
    v = jnp.asarray(velocity_km_s, jnp.float32)
    slowness = 1.0 / v
    nx, ny, nz = v.shape
    ix, iy, iz = source_index
    gi, gj, gk = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    dist_nodes = np.sqrt(
        (gi - ix) ** 2.0 + (gj - iy) ** 2.0 + (gk - iz) ** 2.0
    )
    s_src = float(1.0 / np.asarray(velocity_km_s)[source_index])
    ball = dist_nodes <= source_ball_nodes
    t0 = np.full(v.shape, 1e6, np.float32)
    t0[ball] = dist_nodes[ball] * spacing_km * s_src
    t = _eikonal_sweeps(slowness, jnp.asarray(t0), jnp.float32(spacing_km),
                        n_iters=n_iters)
    return np.asarray(t)


def layered_velocity_grid(
    depths_km: np.ndarray,
    vp_km_s: np.ndarray,
    vs_km_s: np.ndarray,
    grid_depths_km: np.ndarray,
    shape_xy: Tuple[int, int],
) -> Dict[str, np.ndarray]:
    """Expand a 1-D layered model (e.g. the tutorial's Karabulut 2011 CSV)
    to 3-D grids matching the eikonal solver's layout."""
    vp = np.interp(grid_depths_km, depths_km, vp_km_s)
    vs = np.interp(grid_depths_km, depths_km, vs_km_s)
    nx, ny = shape_xy
    return {
        "P": np.broadcast_to(vp, (nx, ny, len(grid_depths_km))).copy(),
        "S": np.broadcast_to(vs, (nx, ny, len(grid_depths_km))).copy(),
    }


def build_travel_time_tables(
    network,
    grid_longitudes: np.ndarray,
    grid_latitudes: np.ndarray,
    grid_depths_km: np.ndarray,
    velocity_models: Dict[str, np.ndarray],
    spacing_km: Optional[float] = None,
    output_path: Optional[str] = None,
    n_iters: int = 300,
):
    """Station-to-grid travel-time tables via the device eikonal solver.

    For each station, solves the eikonal equation with the source at the
    nearest grid node (reciprocity) and samples all (lon, lat, depth) source
    nodes.  Writes the reference HDF5 contract if `output_path` is given.

    Returns ({phase: {station: (n_sources,)}}, source_coordinates dict).
    """
    from ..data.travel_times import TravelTimes
    from ..utils.geo import geodesic_distance_km

    nx, ny, nz = (
        len(grid_longitudes), len(grid_latitudes), len(grid_depths_km)
    )
    if spacing_km is None:
        spacing_km = geodesic_distance_km(
            grid_longitudes[0], grid_latitudes[0],
            grid_longitudes[min(1, nx - 1)], grid_latitudes[0],
        ) or 1.0
    lon_g, lat_g, dep_g = np.meshgrid(
        grid_longitudes, grid_latitudes, grid_depths_km, indexing="ij"
    )
    coords = {
        "longitude": lon_g.reshape(-1),
        "latitude": lat_g.reshape(-1),
        "depth": dep_g.reshape(-1),
    }
    tts: Dict[str, Dict[str, np.ndarray]] = {ph: {} for ph in velocity_models}
    for s, sta in enumerate(network.stations):
        ix = int(np.argmin(np.abs(grid_longitudes - network.longitude[s])))
        iy = int(np.argmin(np.abs(grid_latitudes - network.latitude[s])))
        iz = int(np.argmin(np.abs(grid_depths_km - network.depth[s])))
        for ph, v3d in velocity_models.items():
            t = travel_time_grid(v3d, (ix, iy, iz), spacing_km,
                                 n_iters=n_iters)
            tts[ph][sta] = t.reshape(-1).astype(np.float32)
    if output_path is not None:
        TravelTimes.write_table(output_path, tts, coords)
    return tts, coords
