"""seismic_bpmf_tpu — TPU-native backprojection & matched-filter earthquake
detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
ebeauce/Seismic_BPMF (backprojection detection, template matching, phase
picking, relocation, magnitudes) for TPU hardware: MXU-formulated kernels,
`jax.sharding` meshes instead of file locks and OpenMP, functional core with
a thin convenience layer preserving the reference's file contracts.
"""

__version__ = "0.1.0"

from .config import Config, DEFAULT_CONFIG

__all__ = ["Config", "DEFAULT_CONFIG", "__version__"]
