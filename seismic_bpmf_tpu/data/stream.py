"""Minimal obspy-free waveform containers.

The reference leans on `obspy.Stream`/`obspy.Trace` everywhere; this
framework's device path works on dense `(n_stations, n_components, n_samples)`
arrays, and these containers exist only as a thin host-side convenience layer
(metadata + selection + slicing) with an API shaped like the obspy subset the
reference uses (`select`, `slice`, `trim`, `traces`, `tr.stats.*`), so that
user-supplied data readers written for the reference port over directly.

Times are `numpy.datetime64[ns]` / float epoch seconds (no UTCDateTime).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Iterator, List, Optional

import numpy as np

from ..utils.time import epoch_from_utc, utc_from_epoch


@dataclasses.dataclass
class TraceStats:
    station: str = ""
    network: str = ""
    channel: str = ""
    location: str = ""
    sampling_rate: float = 1.0
    starttime: float = 0.0  # epoch seconds
    # instrument response (data.stationxml.ChannelResponse), attached by
    # readers with attach_response=True; consumed by ops.response
    response: Optional[object] = None

    @property
    def component(self) -> str:
        return self.channel[-1] if self.channel else ""

    @property
    def delta(self) -> float:
        return 1.0 / self.sampling_rate

    @property
    def npts(self) -> int:
        return getattr(self, "_npts", 0)

    @property
    def endtime(self) -> float:
        return self.starttime + max(0, self.npts - 1) / self.sampling_rate

    @property
    def starttime_utc(self) -> np.datetime64:
        return utc_from_epoch(self.starttime)


class Trace:
    """A single-channel waveform segment."""

    def __init__(self, data=None, **stats):
        st = {k: v for k, v in stats.items() if v is not None}
        if "starttime" in st and not isinstance(st["starttime"], (int, float)):
            st["starttime"] = epoch_from_utc(st["starttime"])
        self.stats = TraceStats(**st)
        self.data = np.asarray(data if data is not None else [],
                               dtype=np.float32)

    @property
    def data(self) -> np.ndarray:
        return self._data

    @data.setter
    def data(self, values):
        # keep stats.npts (hence stats.endtime) in sync with the samples
        self._data = np.asarray(values, dtype=np.float32)
        self.stats._npts = len(self._data)

    @property
    def id(self) -> str:
        s = self.stats
        return f"{s.network}.{s.station}.{s.location}.{s.channel}"

    def __len__(self) -> int:
        return len(self.data)

    def times_utc(self) -> np.ndarray:
        n = len(self.data)
        t0 = np.datetime64(int(round(self.stats.starttime * 1e9)), "ns")
        dt = np.timedelta64(int(round(1e9 / self.stats.sampling_rate)), "ns")
        return t0 + dt * np.arange(n)

    def copy(self) -> "Trace":
        tr = Trace(self.data.copy(), **dataclasses.asdict(self.stats))
        return tr

    def slice(self, starttime=None, endtime=None) -> "Trace":
        """Return a view-based sub-trace between two times (inclusive).

        Sample snapping uses the same epsilon-guarded quantization as
        `utils.time.sec_to_samp` so that window extraction is sample-exact
        with moveout arrays built via sec_to_samp (self-detection CC = 1).
        """
        from ..utils.time import sec_to_samp

        sr = self.stats.sampling_rate
        t0 = self.stats.starttime
        i0 = 0
        if starttime is not None:
            st = starttime if isinstance(starttime, (int, float)) else epoch_from_utc(starttime)
            i0 = max(0, int(sec_to_samp(st - t0, sr=sr)))
        i1 = len(self.data)
        if endtime is not None:
            et = endtime if isinstance(endtime, (int, float)) else epoch_from_utc(endtime)
            i1 = min(len(self.data), int(sec_to_samp(et - t0, sr=sr)) + 1)
        out = Trace(self.data[i0:i1], **dataclasses.asdict(self.stats))
        out.stats.starttime = t0 + i0 / sr
        return out

    def trim(self, starttime=None, endtime=None, pad=False, fill_value=0.0) -> "Trace":
        """Trim (in place) to [starttime, endtime], optionally zero-padding."""
        from ..utils.time import sec_to_samp

        sr = self.stats.sampling_rate
        t0 = self.stats.starttime
        st = t0 if starttime is None else (
            starttime if isinstance(starttime, (int, float)) else epoch_from_utc(starttime)
        )
        et = self.stats.endtime if endtime is None else (
            endtime if isinstance(endtime, (int, float)) else epoch_from_utc(endtime)
        )
        n_out = int(sec_to_samp(et - st, sr=sr)) + 1
        i0 = int(sec_to_samp(st - t0, sr=sr))
        out = np.full(n_out, fill_value, dtype=self.data.dtype)
        src_lo = max(0, i0)
        src_hi = min(len(self.data), i0 + n_out)
        if src_hi > src_lo:
            out[src_lo - i0 : src_hi - i0] = self.data[src_lo:src_hi]
        if not pad:
            # without padding, clip to the available data range
            lo = max(0, -i0)
            hi = n_out - max(0, (i0 + n_out) - len(self.data))
            out = out[lo:hi]
            st = st + lo / sr
        self.data = out
        self.stats.starttime = st
        return self

    def __repr__(self):
        s = self.stats
        return (
            f"Trace({self.id} | {s.sampling_rate} Hz | {len(self.data)} samp "
            f"| {utc_from_epoch(s.starttime)})"
        )


class Stream:
    """A list of Traces with obspy-like selection helpers."""

    def __init__(self, traces: Optional[Iterable[Trace]] = None):
        self.traces: List[Trace] = list(traces) if traces is not None else []

    def __iter__(self) -> Iterator[Trace]:
        return iter(self.traces)

    def __len__(self) -> int:
        return len(self.traces)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return Stream(self.traces[i])
        return self.traces[i]

    def __iadd__(self, other):
        if isinstance(other, Trace):
            self.traces.append(other)
        else:
            self.traces.extend(other.traces if isinstance(other, Stream) else other)
        return self

    def __add__(self, other):
        out = Stream(list(self.traces))
        out += other
        return out

    def append(self, tr: Trace):
        self.traces.append(tr)

    def select(self, station=None, network=None, channel=None, component=None,
               location=None) -> "Stream":
        """Select traces matching the given metadata (exact match; component
        matches the trailing character of the channel code)."""
        out = []
        for tr in self.traces:
            s = tr.stats
            if station is not None and s.station != station:
                continue
            if network is not None and s.network != network:
                continue
            if location is not None and s.location != location:
                continue
            if channel is not None and s.channel != channel:
                continue
            if component is not None and s.component != component:
                continue
            out.append(tr)
        return Stream(out)

    def slice(self, starttime=None, endtime=None) -> "Stream":
        return Stream([tr.slice(starttime, endtime) for tr in self.traces])

    def trim(self, starttime=None, endtime=None, pad=False, fill_value=0.0):
        for tr in self.traces:
            tr.trim(starttime, endtime, pad=pad, fill_value=fill_value)
        return self

    def sort(self):
        self.traces.sort(key=lambda tr: (tr.id, tr.stats.starttime))
        return self

    def copy(self) -> "Stream":
        return Stream([tr.copy() for tr in self.traces])

    def __repr__(self):
        head = "\n".join(repr(tr) for tr in self.traces[:20])
        more = f"\n... ({len(self.traces)} traces)" if len(self.traces) > 20 else ""
        return f"Stream with {len(self.traces)} traces:\n{head}{more}"


def from_obspy(obspy_stream) -> Stream:
    """Convert an obspy Stream (if the user has obspy) to this Stream."""
    out = Stream()
    for tr in obspy_stream:
        out += Trace(
            np.asarray(tr.data, dtype=np.float32),
            station=tr.stats.station,
            network=tr.stats.network,
            channel=tr.stats.channel,
            location=str(tr.stats.location),
            sampling_rate=float(tr.stats.sampling_rate),
            starttime=float(tr.stats.starttime.timestamp),
        )
    return out
