"""Host-side utilities (time conversion, geodesy, clustering, logging)."""

from .time import (
    epoch_from_utc,
    round_time,
    samp_to_sec,
    sec_to_samp,
    time_range,
    utc_from_epoch,
)

__all__ = [
    "sec_to_samp",
    "samp_to_sec",
    "round_time",
    "time_range",
    "utc_from_epoch",
    "epoch_from_utc",
]
