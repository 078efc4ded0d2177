"""Hand-assembled miniSEED records (independent of the repo's writer).

`tests/test_mseed.py` validates the codec by round-tripping through its own
writer, which cannot catch a systematic misreading (byte order, time
fields, Steim corner cases).  The records here are built byte by byte from
the SEED 2.4 specification directly in the tests — big- and little-endian,
Steim1/Steim2 at several packing widths, 512 B and 4096 B records, and a
legacy record without blockette 1000 — with hand-computed expected sample
values.  Reference ingestion contract: BPMF/data_reader_examples.py:115-214.
"""

import numpy as np
import pytest

from seismic_bpmf_tpu.data.mseed import _parse_record, read_mseed


# ---------------------------------------------------------------------------
# byte-level builders (deliberately NOT using seismic_bpmf_tpu.data.mseed's
# writer — plain int/bytes arithmetic from the SEED 2.4 spec)
# ---------------------------------------------------------------------------

def _u(v, nbytes, big):
    return int(v).to_bytes(nbytes, "big" if big else "little",
                           signed=v < 0)


def _header(seq=1, sta="TST1", loc="00", cha="BHZ", net="XX",
            year=2012, doy=208, hour=10, minute=0, sec=0, fract=0,
            n_samp=0, sr_factor=25, sr_mult=1, n_blk=1,
            data_ofs=64, blk_ofs=48, big=True):
    """48-byte fixed section header per SEED 2.4 ch. 8."""
    h = f"{seq:06d}".encode() + b"D "
    h += f"{sta:<5s}".encode() + f"{loc:<2s}".encode()
    h += f"{cha:<3s}".encode() + f"{net:<2s}".encode()
    h += _u(year, 2, big) + _u(doy, 2, big)
    h += bytes([hour, minute, sec, 0]) + _u(fract, 2, big)
    h += _u(n_samp, 2, big) + _u(sr_factor, 2, big) + _u(sr_mult, 2, big)
    h += bytes([0, 0, 0, n_blk])          # activity/io/quality flags, n_blk
    h += _u(0, 4, big)                    # time correction
    h += _u(data_ofs, 2, big) + _u(blk_ofs, 2, big)
    assert len(h) == 48
    return h


def _b1000(encoding, word_big, rec_len_pow, big=True):
    return (_u(1000, 2, big) + _u(0, 2, big)
            + bytes([encoding, 1 if word_big else 0, rec_len_pow, 0]))


def _pack_word(diffs, bits, dnib=None):
    """One big-endian Steim data word holding `diffs` at `bits` bits each."""
    w = 0 if dnib is None else dnib << 30
    mask = (1 << bits) - 1
    for k, d in enumerate(diffs):
        w |= (d & mask) << (bits * (len(diffs) - 1 - k))
    return w & 0xFFFFFFFF


def _steim_payload(x0, xn, packed_words, n_frames):
    """Frame set: frame 0 = [ctrl, X0, Xn, data...]; `packed_words` is a
    list of (control_code, word) starting at frame-0 word 3."""
    frames = [[0] * 16 for _ in range(n_frames)]
    frames[0][1] = x0 & 0xFFFFFFFF
    frames[0][2] = xn & 0xFFFFFFFF
    fi, wi = 0, 3
    for code, w in packed_words:
        frames[fi][wi] = w
        frames[fi][0] |= code << (2 * (15 - wi))
        wi += 1
        if wi == 16:
            fi, wi = fi + 1, 1
    out = b"".join(
        _u(w, 4, True) for frame in frames for w in frame
    )
    return out


EPOCH_2012_208_10H = float(
    np.datetime64("2012-07-26T10:00:00", "s").astype(np.int64)
)


def test_big_endian_steim1_512b():
    # diffs: word3 = four 8-bit [d0(ignored), 1, -2, 3],
    #        word4 = two 16-bit [300, -500], word5 = one 32-bit [70000]
    diffs = [1, -2, 3, 300, -500, 70000]
    x0 = 1000
    samples = np.concatenate([[x0], x0 + np.cumsum(diffs)])
    words = [
        (1, _pack_word([0, 1, -2, 3], 8)),
        (2, _pack_word([300, -500], 16)),
        (3, _pack_word([70000], 32)),
    ]
    payload = _steim_payload(x0, int(samples[-1]), words, n_frames=7)
    rec = (_header(n_samp=len(samples)) + _b1000(10, True, 9)
           + b"\x00" * 8 + payload)
    assert len(rec) == 512
    parsed, rec_len = _parse_record(memoryview(rec))
    assert rec_len == 512
    assert parsed["station"] == "TST1"
    assert parsed["network"] == "XX"
    assert parsed["channel"] == "BHZ"
    assert parsed["sampling_rate"] == 25.0
    assert parsed["starttime"] == EPOCH_2012_208_10H
    np.testing.assert_array_equal(parsed["data"], samples)


def test_little_endian_int16_512b():
    samples = np.array([1, -1, 32000, -32000, 12345], np.int16)
    payload = b"".join(_u(int(v), 2, False) for v in samples)
    rec = (_header(n_samp=len(samples), big=False, sta="LE1", fract=5000)
           + _b1000(1, False, 9, big=False))
    rec += b"\x00" * (64 - len(rec)) + payload
    rec += b"\x00" * (512 - len(rec))
    parsed, rec_len = _parse_record(memoryview(rec))
    assert rec_len == 512
    assert parsed["station"] == "LE1"
    # fract is in 0.1 ms units -> 5000 = 0.5 s
    assert parsed["starttime"] == EPOCH_2012_208_10H + 0.5
    np.testing.assert_array_equal(parsed["data"], samples)


def test_big_endian_steim2_4096b():
    # every Steim2 packing width: 8-bit, 15-bit, 10-bit, 30-bit, 6-bit,
    # 5-bit, 4-bit
    groups = [
        (1, None, 8, [0, 5, -5, 10]),        # d0 ignored
        (2, 2, 15, [16000, -16000]),
        (2, 3, 10, [500, -500, 100]),
        (2, 1, 30, [300_000_000]),
        (3, 0, 6, [31, -31, 10, -10, 0]),
        (3, 1, 5, [15, -15, 7, -7, 1, -1]),
        (3, 2, 4, [7, -7, 3, -3, 1, -1, 2]),
    ]
    diffs = [d for _, _, _, ds in groups for d in ds][1:]
    x0 = 100
    samples = np.concatenate([[x0], x0 + np.cumsum(diffs)])
    words = [(code, _pack_word(ds, bits, dnib))
             for code, dnib, bits, ds in groups]
    payload = _steim_payload(x0, int(samples[-1]), words, n_frames=63)
    rec = (_header(n_samp=len(samples)) + _b1000(11, True, 12)
           + b"\x00" * 8 + payload)
    assert len(rec) == 4096
    parsed, rec_len = _parse_record(memoryview(rec))
    assert rec_len == 4096
    np.testing.assert_array_equal(parsed["data"], samples)


def test_no_blockette1000_record_length_inferred(tmp_path):
    """A legacy 512 B record without blockette 1000 (Steim2 default) must
    not swallow the following record by assuming 4096 B."""
    x0_a = 10
    words_a = [(1, _pack_word([0, 1, 1, 1], 8))]
    samples_a = x0_a + np.arange(4)
    payload_a = _steim_payload(x0_a, int(samples_a[-1]), words_a, 7)
    rec_a = _header(n_samp=4, n_blk=0, blk_ofs=0)
    rec_a += b"\x00" * (64 - len(rec_a)) + payload_a

    x0_b = 14
    words_b = [(1, _pack_word([0, 2, 2, 2], 8))]
    samples_b = x0_b + np.array([0, 2, 4, 6])
    payload_b = _steim_payload(x0_b, int(samples_b[-1]), words_b, 7)
    # contiguous in time: 4 samples @ 25 Hz = 0.16 s = 1600 x 0.1 ms
    rec_b = (_header(seq=2, n_samp=4, fract=1600) + _b1000(11, True, 9)
             + b"\x00" * 8 + payload_b)
    assert len(rec_a) == 512 and len(rec_b) == 512

    path = tmp_path / "legacy.mseed"
    path.write_bytes(rec_a + rec_b)
    st = read_mseed(str(path))
    assert len(st) == 1
    np.testing.assert_array_equal(
        st[0].data, np.concatenate([samples_a, samples_b]).astype(np.float32)
    )


def test_no_blockette1000_unrecoverable_raises():
    rec = _header(n_samp=4, n_blk=0, blk_ofs=0)
    rec += b"\x00" * (700 - len(rec))  # not a power-of-two record length
    with pytest.raises(ValueError, match="blockette 1000"):
        _parse_record(memoryview(rec))
