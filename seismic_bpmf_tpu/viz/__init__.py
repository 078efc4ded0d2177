"""Visualization (matplotlib; cartopy optional)."""

from .plots import (
    initialize_map,
    plot_catalog,
    plot_detection_matrix,
    plot_maxbeam,
    plot_template,
    uncertainty_ellipse,
)

__all__ = [
    "initialize_map",
    "plot_catalog",
    "plot_detection_matrix",
    "plot_maxbeam",
    "plot_template",
    "uncertainty_ellipse",
]
