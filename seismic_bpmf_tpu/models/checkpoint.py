"""PhaseNet checkpointing (orbax).

The reference relies on SeisBench's torch ``model.save()``/``from_pretrained``
(used by the notebooks' `ml_detector`); here model state is a Flax pytree, so
persistence goes through orbax — the TPU-native checkpoint library — with a
flax-serialization fallback for environments without orbax.

  save_variables / load_variables : picker weights ({'params', 'batch_stats'})
  save_train_state / load_train_state : full resume state incl. optimizer
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_variables(path: str, variables: Any) -> str:
    """Persist picker variables to `path` (directory). Returns the path."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, _to_host(variables), force=True)
        ckptr.wait_until_finished()
    except ImportError:
        from flax import serialization

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "variables.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(_to_host(variables)))
    return path


def load_variables(path: str, target: Optional[Any] = None) -> Any:
    """Restore picker variables saved by `save_variables`.

    `target` (an example pytree, e.g. from `init_phasenet`) restores exact
    leaf types/shapes; without it the raw tree is returned.
    """
    path = os.path.abspath(path)
    msgpack = os.path.join(path, "variables.msgpack")
    if os.path.isfile(msgpack):
        from flax import serialization

        with open(msgpack, "rb") as f:
            data = f.read()
        if target is not None:
            return serialization.from_bytes(_to_host(target), data)
        return serialization.msgpack_restore(data)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, _to_host(target))
    return ckptr.restore(path)


def save_train_state(path: str, params, batch_stats, opt_state,
                     step: int = 0) -> str:
    """Persist a full training state (resume-capable)."""
    state = {
        "params": params,
        "batch_stats": batch_stats,
        "opt_state": opt_state,
        "step": np.int64(step),
    }
    return save_variables(path, state)


def load_train_state(path: str, target=None):
    """Restore (params, batch_stats, opt_state, step)."""
    state = load_variables(path, target=target)
    return (state["params"], state["batch_stats"], state["opt_state"],
            int(np.asarray(state["step"])))
