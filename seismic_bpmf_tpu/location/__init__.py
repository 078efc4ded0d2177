"""Earthquake location: NLLoc glue, beam relocation, eikonal travel times."""

from .eikonal import (
    build_travel_time_tables,
    layered_velocity_grid,
    travel_time_grid,
)
from .nlloc import (
    read_nlloc_outputs,
    relocate_nlloc,
    write_nlloc_control,
    write_nlloc_grids,
    write_nlloc_obs,
)

__all__ = [
    "build_travel_time_tables",
    "layered_velocity_grid",
    "travel_time_grid",
    "read_nlloc_outputs",
    "relocate_nlloc",
    "write_nlloc_control",
    "write_nlloc_grids",
    "write_nlloc_obs",
]
