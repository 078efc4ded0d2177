"""Eikonal solver tests: homogeneous-medium analytic check and table
generation contract."""

import numpy as np
import pytest

from seismic_bpmf_tpu.location.eikonal import (
    layered_velocity_grid,
    travel_time_grid,
)


class TestEikonal:
    def test_homogeneous_matches_straight_ray(self):
        n = 33
        v = np.full((n, n, n), 4.0, np.float32)  # km/s
        h = 1.0  # km spacing
        src = (n // 2, n // 2, n // 2)
        t = travel_time_grid(v, src, h, n_iters=150)
        x, y, z = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
        dist = h * np.sqrt(
            (x - src[0]) ** 2 + (y - src[1]) ** 2 + (z - src[2]) ** 2
        )
        want = dist / 4.0
        # second-order upwind + analytic source ball (the ball removes the
        # source-singularity error; the one-sided 2nd-order stencil gives
        # O(h^2) error away from it)
        err = np.abs(t - want)[dist > 3.0] / want[dist > 3.0]
        assert np.median(err) < 0.01
        assert err.max() < 0.05
        assert t[src] == 0.0
        # axial rays are exact
        np.testing.assert_allclose(
            t[src[0], src[1], src[2]:], np.arange(n - src[2]) / 4.0,
            atol=1e-5,
        )

    def test_velocity_gradient_is_faster_through_fast_layer(self):
        n = 25
        v = np.full((n, n, n), 3.0, np.float32)
        v[:, :, n // 2 :] = 6.0  # fast half-space at depth
        t = travel_time_grid(v, (0, 0, 0), 1.0, n_iters=200)
        # travel time to the deep far corner must beat the slow-medium time
        slow_time = np.sqrt(3) * (n - 1) / 3.0
        assert t[-1, -1, -1] < slow_time

    def test_layered_model_expansion(self):
        grids = layered_velocity_grid(
            np.array([0.0, 10.0, 30.0]),
            np.array([5.0, 6.0, 8.0]),
            np.array([3.0, 3.5, 4.5]),
            np.linspace(0, 30, 16),
            (4, 5),
        )
        assert grids["P"].shape == (4, 5, 16)
        assert grids["P"][0, 0, 0] == pytest.approx(5.0)
        assert grids["S"][0, 0, -1] == pytest.approx(4.5)
