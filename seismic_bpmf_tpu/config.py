"""Configuration for the TPU-native BPMF framework.

Unlike the reference (BPMF/config.py:53-65), which reads ``BPMF_parameters.cfg``
from the current working directory at *import time* into a mutable global, this
framework uses an explicit, immutable dataclass that is constructed by the user
and passed to the components that need it.  The key schema is kept compatible
with the reference's flat ``key = value`` parameter file so existing parameter
files keep working (``Config.from_file``).

Reference parity: BPMF/config.py:4-27 (parameter schema and types).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict


@dataclasses.dataclass(frozen=True)
class Config:
    """Immutable configuration with the BPMF parameter schema.

    All durations are seconds, all frequencies Hz, unless suffixed otherwise.
    """

    # --- paths -----------------------------------------------------------
    input_path: str = "./input"
    network_path: str = "./network"
    moveouts_path: str = "./moveouts"
    output_path: str = "./output"
    nlloc_input_path: str = "./NLLoc_inputs"
    nlloc_output_path: str = "./NLLoc_outputs"
    nlloc_basename: str = "bpmf"

    # --- signal band / sampling ------------------------------------------
    min_freq_hz: float = 2.0
    max_freq_hz: float = 12.0
    sampling_rate_hz: float = 25.0

    # --- detection parameters --------------------------------------------
    template_len_sec: float = 8.0
    n_dev_mf_threshold: float = 8.0
    n_dev_bp_threshold: float = 15.0
    data_buffer_sec: float = 500.0
    buffer_extracted_events_sec: float = 20.0
    search_win: int = 1
    matched_filter_step_samp: int = 1

    @property
    def template_len_samp(self) -> int:
        from .utils.time import sec_to_samp

        return int(sec_to_samp(self.template_len_sec, sr=self.sampling_rate_hz))

    @property
    def data_buffer_samp(self) -> int:
        from .utils.time import sec_to_samp

        return int(sec_to_samp(self.data_buffer_sec, sr=self.sampling_rate_hz))

    # ------------------------------------------------------------------
    # Reference-compatible flat-file parsing
    # ------------------------------------------------------------------

    # mapping: reference parameter name -> (dataclass field, type)
    _REFERENCE_SCHEMA = {
        "INPUT_PATH": ("input_path", str),
        "NETWORK_PATH": ("network_path", str),
        "MOVEOUTS_PATH": ("moveouts_path", str),
        "OUTPUT_PATH": ("output_path", str),
        "NLLOC_INPUT_PATH": ("nlloc_input_path", str),
        "NLLOC_OUTPUT_PATH": ("nlloc_output_path", str),
        "NLLOC_BASENAME": ("nlloc_basename", str),
        "MIN_FREQ_HZ": ("min_freq_hz", float),
        "MAX_FREQ_HZ": ("max_freq_hz", float),
        "SAMPLING_RATE_HZ": ("sampling_rate_hz", float),
        "TEMPLATE_LEN_SEC": ("template_len_sec", float),
        "N_DEV_MF_THRESHOLD": ("n_dev_mf_threshold", float),
        "N_DEV_BP_THRESHOLD": ("n_dev_bp_threshold", float),
        "DATA_BUFFER_SEC": ("data_buffer_sec", float),
        "BUFFER_EXTRACTED_EVENTS_SEC": ("buffer_extracted_events_sec", float),
        "SEARCH_WIN": ("search_win", int),
        "MATCHED_FILTER_STEP_SAMP": ("matched_filter_step_samp", int),
    }

    @classmethod
    def from_file(cls, path: str, **overrides: Any) -> "Config":
        """Build a Config from a reference-style ``key = value`` file.

        Unknown keys are ignored with a warning rather than crashing, and
        ``PARAMETER_FILE`` (self-referential in the reference schema) is
        skipped.  Keyword overrides win over file values.
        """
        values: Dict[str, Any] = {}
        if os.path.isfile(path):
            with open(path, "r") as f:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("#") or "=" not in line:
                        continue
                    key, value = line.split("=", 1)
                    key, value = key.strip(), value.strip()
                    if key == "PARAMETER_FILE":
                        continue
                    spec = cls._REFERENCE_SCHEMA.get(key)
                    if spec is None:
                        continue
                    field, typ = spec
                    values[field] = typ(value)
        values.update(overrides)
        return cls(**values)

    def to_file(self, path: str) -> None:
        """Write a reference-compatible parameter file."""
        inverse = {field: key for key, (field, _) in self._REFERENCE_SCHEMA.items()}
        with open(path, "w") as f:
            for field in dataclasses.fields(self):
                key = inverse.get(field.name)
                if key is None:
                    continue
                f.write(f"{key} = {getattr(self, field.name)}\n")

    def replace(self, **changes: Any) -> "Config":
        return dataclasses.replace(self, **changes)


# A module-level default for convenience in tests / quick scripts; components
# always accept an explicit `cfg` argument and never read this implicitly
# unless the user omits it.
DEFAULT_CONFIG = Config()
