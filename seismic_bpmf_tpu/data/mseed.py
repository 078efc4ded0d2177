"""Vendored pure-NumPy miniSEED (SEED 2.4 data records) reader/writer.

The reference's primary ingestion path reads tutorial-convention miniSEED
folders through obspy (BPMF/data_reader_examples.py:115-214).  obspy is a
heavy optional dependency; this module implements the subset of miniSEED
the tutorial convention needs so `data_reader_mseed` works without it:

  - fixed 48-byte header + blockette 1000 (+1001 skipped), big/little endian;
  - encodings: int16 (1), int32 (3), float32 (4), float64 (5),
    Steim1 (10), Steim2 (11) — Steim1/2 are what real datacenters serve;
  - a writer (used by tests and data prep) for INT32 / FLOAT32 / STEIM1 /
    STEIM2 records.

Decoded records are assembled into the framework's `Stream`/`Trace`
containers; overlapping/gapped segments merge with zero fill (the
reference's `st.merge(fill_value=0)` behavior).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from .stream import Stream, Trace

_FIXED = 48


# ---------------------------------------------------------------------------
# Steim decoding
# ---------------------------------------------------------------------------

def _sign_extend(v: np.ndarray, bits: int) -> np.ndarray:
    m = np.int64(1) << (bits - 1)
    return ((v.astype(np.int64) & ((np.int64(1) << bits) - 1)) ^ m) - m


def _steim_diffs(words: np.ndarray, steim2: bool) -> List[np.ndarray]:
    """Decode one record's Steim frames (u32 words, (n_frames, 16)) into a
    list of per-word difference arrays (frame-0 words 1-2 are X0/Xn and are
    skipped by the caller)."""
    out: List[np.ndarray] = []
    frames = words.reshape(-1, 16)
    for fi in range(frames.shape[0]):
        ctrl = int(frames[fi, 0])
        for wi in range(1, 16):
            c = (ctrl >> (2 * (15 - wi))) & 3
            if fi == 0 and wi in (1, 2):
                continue  # X0 / Xn
            w = np.int64(frames[fi, wi])
            if c == 0:
                continue
            if c == 1:  # four 8-bit
                v = np.array([(w >> s) & 0xFF for s in (24, 16, 8, 0)])
                out.append(_sign_extend(v, 8))
            elif not steim2:
                if c == 2:  # two 16-bit
                    v = np.array([(w >> 16) & 0xFFFF, w & 0xFFFF])
                    out.append(_sign_extend(v, 16))
                else:  # one 32-bit
                    out.append(_sign_extend(np.array([w]), 32))
            else:
                dnib = (w >> 30) & 3
                if c == 2:
                    if dnib == 1:  # one 30-bit
                        out.append(_sign_extend(np.array([w]), 30))
                    elif dnib == 2:  # two 15-bit
                        v = np.array([(w >> 15) & 0x7FFF, w & 0x7FFF])
                        out.append(_sign_extend(v, 15))
                    elif dnib == 3:  # three 10-bit
                        v = np.array(
                            [(w >> s) & 0x3FF for s in (20, 10, 0)]
                        )
                        out.append(_sign_extend(v, 10))
                else:  # c == 3
                    if dnib == 0:  # five 6-bit
                        v = np.array(
                            [(w >> s) & 0x3F for s in (24, 18, 12, 6, 0)]
                        )
                        out.append(_sign_extend(v, 6))
                    elif dnib == 1:  # six 5-bit
                        v = np.array(
                            [(w >> s) & 0x1F
                             for s in (25, 20, 15, 10, 5, 0)]
                        )
                        out.append(_sign_extend(v, 5))
                    elif dnib == 2:  # seven 4-bit
                        v = np.array(
                            [(w >> s) & 0xF
                             for s in (24, 20, 16, 12, 8, 4, 0)]
                        )
                        out.append(_sign_extend(v, 4))
    return out


def _decode_steim(payload: bytes, n_samp: int, big: bool,
                  steim2: bool) -> np.ndarray:
    n_frames = len(payload) // 64
    words = np.frombuffer(
        payload[: n_frames * 64], dtype=(">u4" if big else "<u4")
    )
    x0 = _sign_extend(
        np.array([np.int64(words.reshape(-1, 16)[0, 1])]), 32
    )[0]
    diffs = _steim_diffs(words, steim2)
    d = (np.concatenate(diffs) if diffs else np.zeros(0, np.int64))[:n_samp]
    # first difference links to the previous record; the first sample is X0
    x = np.empty(n_samp, np.int64)
    if n_samp:
        x[0] = x0
        if n_samp > 1:
            x[1:] = x0 + np.cumsum(d[1:n_samp])
    return x.astype(np.int32)


# ---------------------------------------------------------------------------
# Steim encoding (writer)
# ---------------------------------------------------------------------------

# (code, dnib, count, bits) packing choices, largest count first
_STEIM1_PACK = [(1, None, 4, 8), (2, None, 2, 16), (3, None, 1, 32)]
_STEIM2_PACK = [
    (3, 2, 7, 4), (3, 1, 6, 5), (3, 0, 5, 6), (1, None, 4, 8),
    (2, 3, 3, 10), (2, 2, 2, 15), (2, 1, 1, 30),
]


def _fits(v: np.ndarray, bits: int) -> bool:
    lim = np.int64(1) << (bits - 1)
    return bool(np.all(v >= -lim) and np.all(v < lim))


def _encode_steim(x: np.ndarray, n_frames: int, steim2: bool
                  ) -> Tuple[bytes, int]:
    """Greedy Steim1/2 packing of as many samples of `x` as fit in
    `n_frames` 64-byte frames.  Returns (payload bytes, n_encoded)."""
    x = x.astype(np.int64)
    d = np.diff(x, prepend=x[:1])  # d[0] unused on decode
    pack = _STEIM2_PACK if steim2 else _STEIM1_PACK
    frames = np.zeros((n_frames, 16), dtype=np.uint64)
    fi, wi = 0, 3  # frame 0 reserves words 1 (X0) and 2 (Xn)
    i = 0
    n = len(x)
    while i < n and fi < n_frames:
        for code, dnib, cnt, bits in pack:
            if i + cnt <= n and _fits(d[i : i + cnt], bits):
                w = np.uint64(0)
                if steim2 and dnib is not None:
                    w |= np.uint64(dnib) << np.uint64(30)
                mask = (np.int64(1) << bits) - 1
                vals = d[i : i + cnt] & mask
                for k, v in enumerate(vals):
                    w |= np.uint64(v) << np.uint64(bits * (cnt - 1 - k))
                frames[fi, wi] = w & np.uint64(0xFFFFFFFF)
                frames[fi, 0] |= np.uint64(code) << np.uint64(
                    2 * (15 - wi)
                )
                i += cnt
                break
        else:  # single sample too large even for the widest packing
            raise ValueError("sample difference exceeds Steim range")
        wi += 1
        if wi == 16:
            fi, wi = fi + 1, 1
    n_enc = i
    f0 = frames.reshape(-1, 16)
    f0[0, 1] = np.uint64(x[0] & 0xFFFFFFFF)
    f0[0, 2] = np.uint64(x[n_enc - 1] & 0xFFFFFFFF)
    return frames.astype(">u4").tobytes(), n_enc


# ---------------------------------------------------------------------------
# record parsing
# ---------------------------------------------------------------------------

def _parse_record(buf: memoryview) -> Tuple[dict, int]:
    """Parse one record starting at buf[0]; returns (record dict incl.
    decoded samples, record length)."""
    hdr = bytes(buf[:_FIXED])
    year_be = int.from_bytes(hdr[20:22], "big")
    big = 1900 <= year_be <= 2100
    bo = "big" if big else "little"
    u2 = lambda b: int.from_bytes(b, bo)
    i2 = lambda b: int.from_bytes(b, bo, signed=True)

    year, doy = u2(hdr[20:22]), u2(hdr[22:24])
    hour, minute, sec = hdr[24], hdr[25], hdr[26]
    fract = u2(hdr[28:30])
    n_samp = u2(hdr[30:32])
    f, m = i2(hdr[32:34]), i2(hdr[34:36])
    if f > 0:
        sr = f * m if m > 0 else -f / m
    elif f < 0:
        sr = -m / f if m > 0 else 1.0 / (f * m)
    else:
        sr = 0.0
    act = hdr[36]
    tcorr = int.from_bytes(hdr[40:44], bo, signed=True)
    data_ofs = u2(hdr[44:46])
    blk_ofs = u2(hdr[46:48])

    # walk blockettes for 1000 (encoding, word order, record length)
    enc, word_big, rec_len = 11, True, None
    ofs = blk_ofs
    while ofs:
        btype = u2(bytes(buf[ofs : ofs + 2]))
        nxt = u2(bytes(buf[ofs + 2 : ofs + 4]))
        if btype == 1000:
            enc = buf[ofs + 4]
            word_big = buf[ofs + 5] == 1
            rec_len = 1 << buf[ofs + 6]
        if nxt <= ofs:
            break
        ofs = nxt
    if rec_len is None:
        # legacy record without blockette 1000: infer the record length by
        # scanning power-of-two offsets for the next valid fixed header
        # (6 ASCII digits + quality code) or the end of the buffer, instead
        # of silently assuming 4096 and dropping in-between records
        for cand in (128, 256, 512, 1024, 2048, 4096):
            if cand < _FIXED or cand > len(buf):
                continue
            if cand == len(buf):
                rec_len = cand
                break
            head = bytes(buf[cand : cand + 7])
            if head[:6].isdigit() and head[6:7] in b"DRQM":
                rec_len = cand
                break
        if rec_len is None:
            raise ValueError(
                "miniSEED record lacks blockette 1000 and no subsequent "
                "record header was found at a power-of-two offset; cannot "
                "infer the record length"
            )

    t0 = (
        np.datetime64(f"{year:04d}-01-01", "ns")
        + np.timedelta64(doy - 1, "D")
        + np.timedelta64(hour, "h")
        + np.timedelta64(minute, "m")
        + np.timedelta64(sec, "s")
        + np.timedelta64(fract * 100_000, "ns")
    )
    if not (act & 0x02) and tcorr:
        t0 = t0 + np.timedelta64(tcorr * 100_000, "ns")
    starttime = t0.astype("datetime64[ns]").astype(np.int64) / 1e9

    payload = bytes(buf[data_ofs:rec_len])
    dbo = ">" if word_big else "<"
    if enc == 1:
        data = np.frombuffer(payload, dbo + "i2")[:n_samp].astype(np.int32)
    elif enc == 3:
        data = np.frombuffer(payload, dbo + "i4")[:n_samp]
    elif enc == 4:
        data = np.frombuffer(payload, dbo + "f4")[:n_samp]
    elif enc == 5:
        data = np.frombuffer(payload, dbo + "f8")[:n_samp]
    elif enc in (10, 11):
        data = _decode_steim(payload, n_samp, word_big, steim2=(enc == 11))
    else:
        raise NotImplementedError(f"miniSEED encoding {enc} not supported")

    rec = {
        "station": hdr[8:13].decode("ascii", "replace").strip(),
        "location": hdr[13:15].decode("ascii", "replace").strip(),
        "channel": hdr[15:18].decode("ascii", "replace").strip(),
        "network": hdr[18:20].decode("ascii", "replace").strip(),
        "starttime": starttime,
        "sampling_rate": float(sr),
        "data": data,
    }
    return rec, rec_len


def read_mseed(path, starttime=None, endtime=None) -> Stream:
    """Read a miniSEED file into a Stream (contiguous records of the same
    channel are concatenated; gaps/overlaps merge with zero fill)."""
    with open(path, "rb") as fh:
        buf = memoryview(fh.read())
    recs: List[dict] = []
    pos = 0
    while pos + _FIXED <= len(buf):
        rec, rec_len = _parse_record(buf[pos:])
        pos += rec_len
        if rec["sampling_rate"] > 0 and len(rec["data"]):
            recs.append(rec)
    out = merge_fill(_records_to_stream(recs))
    if starttime is not None or endtime is not None:
        out = out.slice(starttime, endtime)
    return out


def _records_to_stream(recs: List[dict]) -> Stream:
    st = Stream()
    for r in recs:
        st += Trace(
            r["data"].astype(np.float32),
            station=r["station"], network=r["network"],
            channel=r["channel"], location=r["location"],
            sampling_rate=r["sampling_rate"], starttime=r["starttime"],
        )
    return st


def merge_fill(stream: Stream, fill_value: float = 0.0) -> Stream:
    """Merge same-id trace segments onto a common time base, filling gaps
    (the reference's `obspy.Stream.merge(fill_value=0)` behavior): gaps
    get `fill_value`; overlap samples where the segments agree are kept
    (obspy's `_cleanup` pass), while conflicting overlap samples are
    discarded and replaced with `fill_value` (method-0 semantics)."""
    groups: Dict[str, List[Trace]] = {}
    for tr in stream:
        groups.setdefault(tr.id, []).append(tr)
    out = Stream()
    for trs in groups.values():
        if len(trs) == 1:
            out += trs[0]
            continue
        sr = trs[0].stats.sampling_rate
        t0 = min(tr.stats.starttime for tr in trs)
        t1 = max(tr.stats.endtime for tr in trs)
        n = int(round((t1 - t0) * sr)) + 1
        data = np.full(n, fill_value, np.float32)
        written = np.zeros(n, bool)
        conflict = np.zeros(n, bool)
        for tr in sorted(trs, key=lambda t: t.stats.starttime):
            i0 = int(round((tr.stats.starttime - t0) * sr))
            seg = np.asarray(tr.data, np.float32)
            sl = slice(i0, i0 + len(seg))
            conflict[sl] |= written[sl] & (data[sl] != seg)
            data[sl] = np.where(written[sl], data[sl], seg)
            written[sl] = True
        data[conflict] = fill_value
        merged = Trace(data, sampling_rate=sr, starttime=t0,
                       station=trs[0].stats.station,
                       network=trs[0].stats.network,
                       channel=trs[0].stats.channel,
                       location=trs[0].stats.location)
        out += merged
    return out


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

_ENCODINGS = {"INT16": 1, "INT32": 3, "FLOAT32": 4, "STEIM1": 10,
              "STEIM2": 11}


def _btime(epoch: float) -> bytes:
    t = np.datetime64(int(round(epoch * 1e9)), "ns")
    y = t.astype("datetime64[Y]")
    year = int(str(y))
    doy = int((t.astype("datetime64[D]") - y.astype("datetime64[D]"))
              / np.timedelta64(1, "D")) + 1
    rem = t - t.astype("datetime64[D]").astype("datetime64[ns]")
    ns = int(rem / np.timedelta64(1, "ns"))
    hour, ns = divmod(ns, 3_600_000_000_000)
    minute, ns = divmod(ns, 60_000_000_000)
    sec, ns = divmod(ns, 1_000_000_000)
    fract = ns // 100_000
    return (year.to_bytes(2, "big") + doy.to_bytes(2, "big")
            + bytes([hour, minute, sec, 0]) + fract.to_bytes(2, "big"))


def write_mseed(stream: Stream, path: str, encoding: str = "STEIM2",
                record_length: int = 512):
    """Write a Stream as big-endian miniSEED records."""
    enc = _ENCODINGS[encoding.upper()]
    payload_len = record_length - 64
    seq = 1
    with open(path, "wb") as fh:
        for tr in stream:
            sr = tr.stats.sampling_rate
            # sample-rate factor/multiplier: integer rates directly,
            # sub-1Hz via negative factor
            if sr >= 1:
                f, m = int(round(sr)), 1
            else:
                f, m = -int(round(1.0 / sr)), 1
            if encoding.upper() in ("STEIM1", "STEIM2"):
                data = np.asarray(tr.data)
                if not np.issubdtype(data.dtype, np.integer):
                    data = np.round(data).astype(np.int64)
            elif encoding.upper() == "FLOAT32":
                data = np.asarray(tr.data, np.float32)
            else:
                data = np.round(np.asarray(tr.data)).astype(
                    np.int32 if enc == 3 else np.int16
                )
            i = 0
            t = tr.stats.starttime
            while i < len(data):
                if enc == 10 or enc == 11:
                    payload, n_rec = _encode_steim(
                        data[i:], payload_len // 64, steim2=(enc == 11)
                    )
                else:
                    width = {1: 2, 3: 4, 4: 4}[enc]
                    n_rec = min(payload_len // width, len(data) - i)
                    dt = {1: ">i2", 3: ">i4", 4: ">f4"}[enc]
                    payload = data[i : i + n_rec].astype(dt).tobytes()
                    payload += b"\x00" * (payload_len - len(payload))
                hdr = (
                    f"{seq % 1000000:06d}".encode() + b"D " +
                    f"{tr.stats.station:<5.5s}".encode() +
                    f"{tr.stats.location:<2.2s}".encode() +
                    f"{tr.stats.channel:<3.3s}".encode() +
                    f"{tr.stats.network:<2.2s}".encode() +
                    _btime(t) +
                    int(n_rec).to_bytes(2, "big") +
                    int(f).to_bytes(2, "big", signed=True) +
                    int(m).to_bytes(2, "big", signed=True) +
                    bytes([0, 0, 0, 1]) +      # flags + 1 blockette
                    (0).to_bytes(4, "big") +   # time correction
                    (64).to_bytes(2, "big") +  # data offset
                    (48).to_bytes(2, "big")    # first blockette
                )
                blk1000 = (
                    (1000).to_bytes(2, "big") + (0).to_bytes(2, "big")
                    + bytes([enc, 1, record_length.bit_length() - 1, 0])
                )
                fh.write(hdr + blk1000
                         + b"\x00" * (64 - _FIXED - len(blk1000)) + payload)
                i += n_rec
                t += n_rec / sr
                seq += 1
