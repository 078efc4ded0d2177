"""Continuous-data container and array extraction.

Reference parity: `Data` (BPMF/dataset.py:857-1049) and `utils.get_np_array`
(BPMF/utils.py:1589-1660), built on the obspy-free `Stream` container.
The device pipeline consumes the dense `(n_sta, n_comp, n_samp)` float32
array this module produces.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np
import pandas as pd

from ..utils.time import epoch_from_utc, sec_to_samp, time_range, utc_from_epoch
from .stream import Stream, Trace

DEFAULT_ALIASES = {"N": ["N", "1"], "E": ["E", "2"], "Z": ["Z"]}


def get_np_array(
    stream: Stream,
    stations,
    components=("N", "E", "Z"),
    priority: str = "HH",
    n_samples: Optional[int] = None,
    component_aliases: Dict[str, List[str]] = DEFAULT_ALIASES,
    verbose: bool = True,
):
    """Stream -> (n_stations, n_components, n_samples) float32 array.

    Missing channels are zero-filled; short traces are zero-padded; aliases
    (e.g. '1' for 'N') are tried in order; `priority` selects between
    multiple instruments (reference: BPMF/utils.py:1589-1660).
    """
    if len(stream) == 0:
        if verbose:
            print("The input data stream is empty!")
        return None
    if n_samples is None:
        n_samples = len(stream[0].data)
    data = np.zeros((len(stations), len(components), n_samples), np.float32)
    for s, sta in enumerate(stations):
        for c, cp in enumerate(components):
            channel = Stream()
            for cp_alias in component_aliases.get(cp, [cp]):
                channel = stream.select(station=sta, component=cp_alias)
                if len(channel) > 0:
                    break
            if len(channel) == 0:
                continue
            preferred = channel.select(channel=f"{priority}{cp_alias}")
            tr = preferred[0] if len(preferred) > 0 else channel[0]
            n = min(len(tr.data), n_samples)
            data[s, c, :n] = tr.data[:n]
    return data


class Data:
    """One fixed-duration window (typically a day) of continuous waveforms.

    Reference parity: BPMF/dataset.py:857-1049.
    """

    def __init__(
        self,
        date,
        where: str,
        data_reader: Callable,
        duration: float = 24.0 * 3600.0,
        sampling_rate: Optional[float] = None,
    ):
        self.date = np.datetime64(date, "ns")
        self.where = where
        self.data_reader = data_reader
        self.duration = duration
        self.sampling_rate = sampling_rate

    # ------------------------------------------------------------------
    @property
    def date_epoch(self) -> float:
        return epoch_from_utc(self.date)

    @property
    def n_samples(self) -> Optional[int]:
        if self.sampling_rate is None:
            return None
        return int(sec_to_samp(self.duration, sr=self.sampling_rate))

    @property
    def sr(self):
        return self.sampling_rate

    @property
    def time(self):
        end = self.date + np.timedelta64(int(self.duration * 1e9), "ns")
        return time_range(self.date, end, 1.0 / self.sr, unit="ms")

    # ------------------------------------------------------------------
    def read_waveforms(self, trim_traces: bool = True, **reader_kwargs):
        reader_kwargs.setdefault("starttime", self.date)
        reader_kwargs.setdefault(
            "endtime", self.date + np.timedelta64(int(self.duration * 1e9), "ns")
        )
        self.traces = self.data_reader(self.where, **reader_kwargs)
        if trim_traces:
            self.trim_waveforms()
        return self

    def trim_waveforms(self, starttime=None, endtime=None):
        if starttime is None:
            starttime = self.date_epoch
        elif not isinstance(starttime, (int, float)):
            starttime = epoch_from_utc(starttime)
        if endtime is None:
            endtime = self.date_epoch + self.duration
        elif not isinstance(endtime, (int, float)):
            endtime = epoch_from_utc(endtime)
        for tr in self.traces:
            tr.trim(starttime=starttime, endtime=endtime, pad=True, fill_value=0.0)

    def get_np_array(
        self,
        stations,
        components=("N", "E", "Z"),
        component_aliases=DEFAULT_ALIASES,
        priority="HH",
        verbose=True,
    ):
        if not hasattr(self, "traces"):
            raise RuntimeError("call read_waveforms first")
        return get_np_array(
            self.traces,
            stations,
            components=components,
            priority=priority,
            component_aliases=component_aliases,
            n_samples=self.n_samples,
            verbose=verbose,
        )

    def set_availability(
        self,
        stations,
        components=("N", "E", "Z"),
        component_aliases=DEFAULT_ALIASES,
    ):
        """A channel is available if it has any non-zero sample.

        Reference parity: BPMF/dataset.py:966-1018.
        """
        if not hasattr(self, "traces"):
            raise RuntimeError("call read_waveforms first")
        stations = list(stations)
        self.availability_per_sta = pd.Series(
            index=stations, data=np.zeros(len(stations), dtype=bool)
        )
        self.availability_per_cha = pd.DataFrame(index=stations)
        for cp in components:
            availability = np.zeros(len(stations), dtype=bool)
            for s, sta in enumerate(stations):
                for cp_alias in component_aliases.get(cp, [cp]):
                    trs = self.traces.select(station=sta, component=cp_alias)
                    if len(trs) == 0:
                        continue
                    if np.any(trs[0].data.astype(np.float32) != 0.0):
                        availability[s] = True
                        break
            self.availability_per_cha[cp] = availability
            self.availability_per_sta = self.availability_per_sta | availability
        self.availability = self.availability_per_sta
        return self.availability
