"""Device-mesh helpers.

The reference distributes work with one POSIX process per day and lock files
(SURVEY.md section 2.4); here the axes of parallelism map onto a
`jax.sharding.Mesh`:

  - 'src'  : beamforming source-grid axis (embarrassingly parallel; the
             max/argmax over sources becomes a pmax/pmin pair over ICI)
  - 'tp'   : matched-filter template axis (embarrassingly parallel)
  - 'time' : the continuous-data time axis, sharded with a one-sided halo
             exchange (ppermute) sized max(moveout) + template_len — the
             CC/beam analogue of block-wise sequence parallelism
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh.

    axis_sizes : mapping axis name -> size, e.g. {'src': 4, 'time': 2}.
        If None, a 1-D mesh over all devices with axis 'work'.
        One entry may be -1 to absorb the remaining devices.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {"work": n}
    names = list(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    if -1 in sizes:
        known = math.prod(s for s in sizes if s != -1)
        sizes[sizes.index(-1)] = n // known
    if math.prod(sizes) != n:
        raise ValueError(
            f"mesh {dict(zip(names, sizes))} does not match {n} devices"
        )
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))
