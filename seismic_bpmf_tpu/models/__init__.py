"""Neural models (Flax): the PhaseNet phase picker."""

from .phasenet import (
    PhaseNet,
    convert_seisbench_weights,
    init_phasenet,
    make_picker,
    make_train_step,
    sliding_window_probas,
)

__all__ = [
    "PhaseNet",
    "convert_seisbench_weights",
    "init_phasenet",
    "make_picker",
    "make_train_step",
    "sliding_window_probas",
]
