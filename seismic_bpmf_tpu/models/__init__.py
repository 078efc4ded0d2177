"""Neural models (Flax): the PhaseNet phase picker."""

from .checkpoint import (
    load_train_state,
    load_variables,
    save_train_state,
    save_variables,
)
from .training import train_phasenet, windows_from_events
from .phasenet import (
    PhaseNet,
    SeisBenchPhaseNet,
    convert_seisbench_weights,
    init_phasenet,
    load_seisbench_checkpoint,
    make_picker,
    make_train_step,
    sliding_window_probas,
)

__all__ = [
    "PhaseNet",
    "SeisBenchPhaseNet",
    "load_seisbench_checkpoint",
    "train_phasenet",
    "windows_from_events",
    "convert_seisbench_weights",
    "init_phasenet",
    "make_picker",
    "make_train_step",
    "sliding_window_probas",
    "save_variables",
    "load_variables",
    "save_train_state",
    "load_train_state",
]
