"""Earthquake location: NLLoc glue and beam relocation."""

from .nlloc import (
    read_nlloc_outputs,
    relocate_nlloc,
    write_nlloc_control,
    write_nlloc_grids,
    write_nlloc_obs,
)

__all__ = [
    "read_nlloc_outputs",
    "relocate_nlloc",
    "write_nlloc_control",
    "write_nlloc_grids",
    "write_nlloc_obs",
]
