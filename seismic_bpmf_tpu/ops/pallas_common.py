"""Shared Pallas helpers."""

from __future__ import annotations

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def lane_slice(ref, row_start, n_rows, start, width):
    """Read ``ref[row_start : row_start+n_rows, start : start+width]`` with an
    arbitrary traced lane offset `start`.

    Mosaic only allows 128-aligned dynamic lane offsets, so this loads the
    aligned superset ``[128*(start//128), ... + width + 128)`` and rotates it
    into place with a dynamic cross-lane roll.  The ref's lane size must be
    at least ``(max_start//128)*128 + width + 128``.
    """
    q = (start // 128) * 128
    r = start - q
    chunk_w = width + 128
    chunk = ref[pl.ds(row_start, n_rows), pl.ds(pl.multiple_of(q, 128), chunk_w)]
    rolled = pltpu.roll(chunk, chunk_w - r, 1)
    return rolled[:, :width]
