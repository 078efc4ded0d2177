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


def _shift(t, ax, d):
    """t shifted by d along ax with edge replication (values only used
    under upwind masks that exclude the replicated cells)."""
    n = t.shape[ax]
    if d > 0:
        pad = jax.lax.slice_in_dim(t, n - 1, n, axis=ax)
        body = jax.lax.slice_in_dim(t, d, n, axis=ax)
        return jnp.concatenate([body] + [pad] * d, axis=ax)
    d = -d
    pad = jax.lax.slice_in_dim(t, 0, 1, axis=ax)
    body = jax.lax.slice_in_dim(t, 0, n - d, axis=ax)
    return jnp.concatenate([pad] * d + [body], axis=ax)


@functools.partial(jax.jit, static_argnames=("n_iters", "order"))
def _eikonal_sweeps(slowness, t0, h, n_iters: int = 300, order: int = 2):
    """Iterative Godunov upwind relaxation of |grad T| = s on a regular grid.

    slowness : (nx, ny, nz) s/km; t0 : initial times (1e6 except sources);
    h : grid spacing in km.  `order=2` uses one-sided second-order upwind
    differences where the two upwind neighbors are causally ordered
    (t2 <= t1), falling back to first order elsewhere — O(h^2) error away
    from the source instead of O(h).
    """
    big = jnp.float32(1e6)

    def axis_operands(t):
        """Per axis: (a, alpha) with a the effective upwind value and
        alpha the scheme weight (1 first-order, 9/4 second-order)."""
        ops = []
        for ax in range(3):
            n = t.shape[ax]
            t1m, t1p = _shift(t, ax, -1), _shift(t, ax, 1)
            t1 = jnp.minimum(t1m, t1p)
            if order == 2 and n >= 5:
                t2m, t2p = _shift(t, ax, -2), _shift(t, ax, 2)
                # pick the upwind direction's 2nd neighbor; disable the
                # second-order stencil within 2 cells of the upwind edge
                # (the shifted arrays replicate edge cells there)
                idx = jax.lax.broadcasted_iota(jnp.int32, t.shape, ax)
                minus = t1m <= t1p
                t2 = jnp.where(minus, t2m, t2p)
                in_grid = jnp.where(minus, idx >= 2, idx <= n - 3)
                use2 = (t2 <= t1) & (t1 < big) & in_grid
                a2 = (4.0 * t1 - t2) / 3.0
                a = jnp.where(use2, a2, t1)
                alpha = jnp.where(use2, 2.25, 1.0)
            else:
                a, alpha = t1, jnp.ones_like(t1)
            ops.append((a, alpha))
        return ops

    def update(t, _):
        (a1, w1), (a2, w2), (a3, w3) = axis_operands(t)
        # sort the three (a, w) pairs by a with compare-swaps
        def cswap(av, aw, bv, bw):
            lo = av <= bv
            return (jnp.where(lo, av, bv), jnp.where(lo, aw, bw),
                    jnp.where(lo, bv, av), jnp.where(lo, bw, aw))

        a1, w1, a2, w2 = cswap(a1, w1, a2, w2)
        a2, w2, a3, w3 = cswap(a2, w2, a3, w3)
        a1, w1, a2, w2 = cswap(a1, w1, a2, w2)

        f = slowness * h
        f2 = f * f
        # cascade: include operands in increasing a while t > a_next
        t1c = a1 + f * jax.lax.rsqrt(w1)
        # 2 operands: solve w1 (t-a1)^2 + w2 (t-a2)^2 = f^2
        A2 = w1 + w2
        B2 = w1 * a1 + w2 * a2
        # C in the stable (shifted) form: expand around a1 to avoid
        # cancellation against the 1e6 sentinel
        d21 = a2 - a1
        disc2 = A2 * f2 - w1 * w2 * d21 * d21
        t2c = jnp.where(
            (t1c > a2) & (disc2 > 0),
            (B2 + jnp.sqrt(jnp.maximum(disc2, 0.0))) / A2,
            t1c,
        )
        # 3 operands
        A3 = A2 + w3
        B3 = B2 + w3 * a3
        d31 = a3 - a1
        d32 = a3 - a2
        disc3 = (A3 * f2 - w1 * w2 * d21 * d21 - w1 * w3 * d31 * d31
                 - w2 * w3 * d32 * d32)
        t3c = jnp.where(
            (t2c > a3) & (disc3 > 0),
            (B3 + jnp.sqrt(jnp.maximum(disc3, 0.0))) / A3,
            t2c,
        )
        return jnp.minimum(t, t3c), None

    t, _ = jax.lax.scan(update, t0, None, length=n_iters)
    return t


def travel_time_grid(
    velocity_km_s: np.ndarray,
    source_index: Tuple[int, int, int],
    spacing_km: float,
    n_iters: int = 300,
    source_ball_nodes: float = 4.0,
    order: int = 2,
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
                        n_iters=n_iters, order=order)
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
