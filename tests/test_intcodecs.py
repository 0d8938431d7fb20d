"""Roundtrip + strictness tests for every int codec and the auto-selector."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zseq import select
from zseq.codecs import intcodecs as IC

ALL_CODECS = [IC.T_RAW, IC.T_ZBRA, IC.T_PACK, IC.T_FORBP, IC.T_DELTA,
              IC.T_DICT, IC.T_RLE]

CASES = {
    "sequential": np.arange(10000, dtype=np.int64) * 3 + 7,
    "random_wide": np.random.default_rng(1).integers(-(2**62), 2**62, 3000),
    "small_range": np.random.default_rng(2).integers(0, 250, 5000),
    "repetitive": np.repeat(np.random.default_rng(3).integers(0, 5, 200), 50),
    "constant": np.full(777, -42, dtype=np.int64),
    "clustered_ts": 1640995200000
    + np.random.default_rng(4).integers(0, 3600, 8000).astype(np.int64),
    "int64_edges": np.array(
        [2**63 - 1, -(2**63), 0, -1, 1, 4611686018427387904,
         -1152921504606846976], dtype=np.int64),
    "single": np.array([5], dtype=np.int64),
    "two": np.array([-(2**63), 2**63 - 1], dtype=np.int64),
}


@pytest.mark.parametrize("name", CASES)
@pytest.mark.parametrize("codec", ALL_CODECS)
def test_forced_codec_roundtrip(name, codec):
    arr = CASES[name]
    if codec == IC.T_DELTA and arr.size < 2:
        pytest.skip("delta needs >=2 values")
    enc = IC.encode_ints(arr, codec=codec)
    dec, pos = IC.decode_ints(enc, 0, arr.size)
    assert pos == len(enc)
    assert np.array_equal(dec, arr)


@pytest.mark.parametrize("name", CASES)
def test_auto_roundtrip_and_never_worse_than_raw_plus_slack(name):
    arr = CASES[name]
    enc = IC.encode_ints(arr)
    dec, _ = IC.decode_ints(enc, 0, arr.size)
    assert np.array_equal(dec, arr)
    assert len(enc) <= arr.size * 8 + 64 + arr.size  # sane upper bound


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                max_size=300))
def test_auto_property(values):
    arr = np.array(values, dtype=np.int64)
    enc = IC.encode_ints(arr)
    dec, pos = IC.decode_ints(enc, 0, arr.size)
    assert pos == len(enc)
    assert np.array_equal(dec, arr)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200),
    st.sampled_from(ALL_CODECS),
)
def test_every_codec_property(values, codec):
    arr = np.array(values, dtype=np.int64)
    if codec == IC.T_DELTA and arr.size < 2:
        return
    enc = IC.encode_ints(arr, codec=codec)
    dec, _ = IC.decode_ints(enc, 0, arr.size)
    assert np.array_equal(dec, arr)


def test_selector_picks_sensibly():
    assert IC.encode_ints(CASES["constant"])[0] == IC.T_CONST
    assert IC.encode_ints(CASES["sequential"])[0] == IC.T_DELTA
    assert IC.encode_ints(CASES["repetitive"])[0] == IC.T_RLE
    # small-range data must land on something bit-packing-shaped
    assert IC.encode_ints(CASES["small_range"])[0] in (
        IC.T_FORBP, IC.T_PACK, IC.T_ZBRA)


def test_selected_size_beats_zbra_on_all_compressible_cases():
    """The engine's whole point: per-column output <= the reference
    pipeline's bytes on the same data (within segment-header slack)."""
    for name, arr in CASES.items():
        ours = len(IC.encode_ints(arr))
        zbra = len(IC.encode_ints(arr, codec=IC.T_ZBRA))
        assert ours <= zbra + 16, (name, ours, zbra)


def test_truncated_segment_raises():
    enc = IC.encode_ints(np.arange(1000))
    with pytest.raises(ValueError):
        IC.decode_ints(enc[: len(enc) - 5], 0, 1000)


def test_rle_bad_lengths_raises():
    import struct

    vals = IC.encode_ints(np.array([1, 2]), codec=IC.T_RAW)
    lens = IC.encode_ints(np.array([3, 4]), codec=IC.T_RAW)
    payload = struct.pack("<I", 2) + vals + lens
    seg = IC.HEADER.pack(IC.T_RLE, len(payload)) + payload
    with pytest.raises(ValueError):
        IC.decode_ints(seg, 0, 5)


def test_stats_and_prediction_shapes():
    arr = CASES["clustered_ts"]
    st_ = select.int_stats(arr)
    assert st_.n == arr.size
    sizes = select.predict_int_sizes(st_)
    assert IC.T_FORBP in sizes and sizes[IC.T_FORBP] > 0


def test_segment_zone_short_payload_returns_none():
    """Corrupt/short payloads must disable pruning (None), not silently
    yield wrong bounds that would skip live blocks."""
    import struct as _s
    import numpy as np
    from zseq.codecs import intcodecs as IC

    vals = np.arange(1000, dtype=np.int64) * 3
    seg = IC.encode_ints(vals, codec=IC.T_FORBP)
    assert IC.segment_zone(seg, 0, vals.size) is not None
    tag, plen = IC.HEADER.unpack_from(seg, 0)
    # keep only the mini-count, drop the per-mini headers
    short = IC.HEADER.pack(tag, 2) + bytes(seg[IC.HEADER.size:
                                              IC.HEADER.size + 2])
    assert IC.segment_zone(short, 0, vals.size) is None
    for t in (IC.T_CONST, IC.T_PACK, IC.T_DELTA, IC.T_DICT, IC.T_WRAP):
        assert IC.segment_zone(IC.HEADER.pack(t, 0), 0, 10) is None


def test_selector_not_fooled_by_sub_stride_oscillation():
    """Adjacent ±big oscillation with period smaller than the strided
    sample step: per-window adjacent deltas must expose the true delta
    width so DELTA's predicted size isn't a fantasy (strided diffs used
    to read it as smooth)."""
    import numpy as np

    n = 2_000_000
    base = np.arange(n, dtype=np.int64) // 1000      # slow upward drift
    osc = np.where(np.arange(n) % 2 == 0, 0, 1_000_000)
    arr = base + osc
    st = select.int_stats(arr)
    assert st.delta_bits >= 20, st.delta_bits   # ~2e6 zigzag ≈ 21 bits
    chosen = select.select_int_codec(arr)
    assert chosen != IC.T_DELTA, IC.INT_CODEC_NAMES[chosen]
    # and the honest pick must still roundtrip
    enc = IC.encode_ints(arr)
    dec, _ = IC.decode_ints(enc, 0, n)
    assert np.array_equal(dec, arr)


def test_const_strict_payload_size():
    """T_CONST payloads must be exactly 8 bytes — a truncated payload
    would silently decode to a wrong value."""
    import struct as _st

    seg = IC.encode_ints(np.full(5, 42, dtype=np.int64))
    tag, plen = _st.unpack_from("<BI", seg, 0)
    assert tag == IC.T_CONST and plen == 8
    bad = bytes([tag]) + _st.pack("<I", 3) + seg[5:8]
    with pytest.raises(ValueError, match="const"):
        IC.decode_ints(bad, 0, 5)


# ---------------------------------------------------------------------------
# Round-6 optimization: the int32 decode path (decode_ints dtype=np.int32)
# must match the int64 path truncated with astype(int32) for every codec,
# and roundtrip int32 inputs exactly.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("tag", [None, IC.T_RAW, IC.T_ZBRA, IC.T_PACK,
                                 IC.T_FORBP, IC.T_DELTA, IC.T_DICT,
                                 IC.T_RLE])
def test_decode_ints_narrow_matches_int64(tag):
    rng = np.random.default_rng(17)
    for a in (rng.integers(-(2**31), 2**31, 5000),
              rng.integers(0, 200, 5000),
              np.repeat(rng.integers(0, 9, 200), rng.integers(1, 30, 200)),
              np.sort(rng.integers(-(2**31), 2**31, 1025)),
              np.array([-(2**31), 2**31 - 1, 0, -1]),
              rng.integers(-3, 3, 2)):
        a32 = a.astype(np.int32)
        seg = IC.encode_ints(a32, codec=tag)
        d64, p64 = IC.decode_ints(seg, 0, a32.size)
        d32, p32 = IC.decode_ints(seg, 0, a32.size, np.int32)
        assert p64 == p32
        assert d32.dtype == np.int32
        assert np.array_equal(d32, d64.astype(np.int32))
        assert np.array_equal(d32, a32)


def test_decode_ints_narrow_const():
    seg = IC.encode_ints(np.full(100, -7, dtype=np.int32),
                         codec=IC.T_CONST)
    d32, _ = IC.decode_ints(seg, 0, 100, np.int32)
    assert d32.dtype == np.int32 and (d32 == -7).all()
