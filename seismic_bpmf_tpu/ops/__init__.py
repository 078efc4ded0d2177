"""Device kernels (JAX/XLA/Pallas) and their NumPy oracles."""

from . import reference
from .beamform import beamform, fold_components
from .pallas_bp import PallasBeamformPlan, beamform_pallas
from .pallas_mf import PallasMatchedFilterPlan, matched_filter_pallas
from .signal import bandpass_zerophase, preprocess_batch, resample_fourier
from .cf import envelope, kurtosis, saturated_envelopes, scalar_kurtosis
from .matched_filter import matched_filter
from .response import (cosine_sac_taper, remove_response_arr,
                       remove_response_stream)
from .thresholds import (bp_detection_threshold,
                         time_dependent_threshold,
                         time_dependent_threshold_pd)

__all__ = [
    "reference",
    "beamform",
    "beamform_pallas",
    "matched_filter_pallas",
    "PallasMatchedFilterPlan",
    "PallasBeamformPlan",
    "bandpass_zerophase",
    "preprocess_batch",
    "resample_fourier",
    "fold_components",
    "matched_filter",
    "envelope",
    "kurtosis",
    "saturated_envelopes",
    "scalar_kurtosis",
    "time_dependent_threshold",
    "bp_detection_threshold",
    "time_dependent_threshold_pd",
    "cosine_sac_taper",
    "remove_response_arr",
    "remove_response_stream",
]
