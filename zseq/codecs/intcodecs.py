"""Integer column codecs over a self-describing recursive segment format.

Every encoded integer array is a *segment*:

    tag: u8 | count: u32 LE | payload_len: u32 LE | payload

Segments nest (DICT's dictionary and indices are themselves segments), which
lets codecs compose — this is the per-column-codec design zbra documents as
FUTURE work (/root/reference/docs/design.md:222-302) built for real.

Codec family (all int64-domain, like zbra's pipeline; narrower physical
types are handled at the column layer):

  CONST   one value repeated                        (RLE degenerate case)
  RAW     8-byte LE each                            (incompressible fallback)
  ZBRA    the reference's exact FOR->ZZ->BP64 pipeline
          (/root/reference/zbra-core/src/compression.rs:271-292)
  FORBP   mini-block frame-of-reference + bit-pack: per-1024-value blocks,
          per-block min and bit width — fixes the reference's known sharp
          edge where one outlier poisons a whole column's bit width
          (compression.rs:130-131; SURVEY.md §4.3)
  DELTA   first value + zig-zag'd successive deltas, sub-encoded with FORBP
          (wins on sorted/monotonic data)
  DICT    sorted unique values + FORBP-packed indices (low cardinality)
  RLE     run values + run lengths, each sub-encoded (repetitive data)

Decode is strict: truncated or trailing payload bytes raise, per the
rebuild contract (reference silently zero-fills, compression.rs:198-205).
"""

from __future__ import annotations

import struct

import numpy as np

from . import primitives as P

HEADER = struct.Struct("<BII")  # tag, count, payload_len

T_CONST = 0x01
T_RAW = 0x02
T_ZBRA = 0x03
T_FORBP = 0x04
T_DELTA = 0x05
T_DICT = 0x06
T_RLE = 0x07
T_WRAP = 0x08   # zstd-wrapped nested segment (cascade compression)

MINI = 1024  # FORBP mini-block size

INT_CODEC_NAMES = {
    T_CONST: "const",
    T_RAW: "raw",
    T_ZBRA: "zbra_pipe",
    T_FORBP: "forbp",
    T_DELTA: "delta",
    T_DICT: "dict",
    T_RLE: "rle",
    T_WRAP: "zstd_wrap",
}
INT_CODEC_TAGS = {v: k for k, v in INT_CODEC_NAMES.items()}

_wrap = np.errstate(over="ignore")


def _seg(tag: int, count: int, payload: bytes) -> bytes:
    return HEADER.pack(tag, count, len(payload)) + payload


def _as_i64(values) -> np.ndarray:
    arr = np.asarray(values)
    if arr.dtype != np.int64:
        arr = arr.astype(np.int64)
    return np.ascontiguousarray(arr)


# ---------------------------------------------------------------------------
# Individual codec payload encoders  (int64 ndarray -> payload bytes)
# ---------------------------------------------------------------------------

def _enc_const(arr: np.ndarray) -> bytes:
    return int(arr[0]).to_bytes(8, "little", signed=True)


def _enc_raw(arr: np.ndarray) -> bytes:
    return arr.astype("<i8").tobytes()


def _enc_zbra(arr: np.ndarray) -> bytes:
    return P.zbra_compress_int_array(arr)


def _enc_forbp(arr: np.ndarray, mini: int = MINI) -> bytes:
    """Mini-block FOR+bitpack. Layout:
    mini u16 | nminis u32 | nminis x (min i64 LE, width u8) | packed minis
    (byte-aligned). width==0 means all values in the block equal its min.
    width==64 stores raw 8-byte deltas (total for any int64 via wrapping
    subtraction)."""
    n = arr.size
    nminis = (n + mini - 1) // mini
    heads = bytearray()
    bodies = []
    for m in range(nminis):
        blk = arr[m * mini : (m + 1) * mini]
        lo = int(blk.min())
        with _wrap:
            deltas = (blk - np.int64(lo)).view(np.uint64)
        hi = int(deltas.max())
        width = 0 if hi == 0 else hi.bit_length()
        heads += int(lo).to_bytes(8, "little", signed=True)
        heads.append(width)
        if width == 0:
            continue
        if width == 64:
            bodies.append(deltas.astype("<u8").tobytes())
        else:
            bodies.append(P.pack_width(deltas, width))
    return struct.pack("<HI", mini, nminis) + bytes(heads) + b"".join(bodies)


def _dec_forbp(payload: memoryview, count: int) -> np.ndarray:
    mini, nminis = struct.unpack_from("<HI", payload, 0)
    pos = 6
    if mini == 0:
        raise ValueError("forbp: zero mini-block size")
    mins = np.empty(nminis, dtype=np.int64)
    widths = np.empty(nminis, dtype=np.uint8)
    for m in range(nminis):
        mins[m] = int.from_bytes(payload[pos : pos + 8], "little", signed=True)
        widths[m] = payload[pos + 8]
        pos += 9
    out = np.empty(count, dtype=np.int64)
    for m in range(nminis):
        lo_idx = m * mini
        blk_n = min(mini, count - lo_idx)
        if blk_n <= 0:
            raise ValueError("forbp: mini-block count exceeds element count")
        w = int(widths[m])
        if w == 0:
            deltas = np.zeros(blk_n, dtype=np.uint64)
        elif w == 64:
            nb = blk_n * 8
            deltas = np.frombuffer(payload[pos : pos + nb], dtype="<u8")
            if deltas.size != blk_n:
                raise ValueError("forbp: truncated raw mini-block")
            pos += nb
        else:
            nb = (blk_n * w + 7) // 8
            deltas = P.unpack_width(payload[pos : pos + nb], blk_n, w)
            pos += nb
        with _wrap:
            out[lo_idx : lo_idx + blk_n] = (
                deltas + mins[m].view(np.uint64)
            ).view(np.int64)
    if pos != len(payload):
        raise ValueError(
            f"forbp: trailing payload bytes ({len(payload) - pos})"
        )
    return out


def _enc_delta(arr: np.ndarray) -> bytes:
    with _wrap:
        diffs = np.diff(arr)
    zz = P.zigzag_encode(diffs).view(np.int64)
    sub = encode_ints(zz, exclude=frozenset({T_DELTA}))
    return int(arr[0]).to_bytes(8, "little", signed=True) + sub


def _dec_delta(payload: memoryview, count: int) -> np.ndarray:
    first = int.from_bytes(payload[0:8], "little", signed=True)
    zz, pos = decode_ints(payload, 8)
    if pos != len(payload):
        raise ValueError("delta: trailing payload bytes")
    diffs = P.zigzag_decode(zz.view(np.uint64))
    out = np.empty(count, dtype=np.int64)
    out[0] = first
    if count > 1:
        with _wrap:
            np.cumsum(diffs, out=out[1:])
            out[1:] += np.int64(first)
    return out


def _enc_dict(arr: np.ndarray) -> bytes:
    uniq, idx = np.unique(arr, return_inverse=True)
    d = encode_ints(uniq, codec=_pick_simple(uniq))
    i = encode_ints(idx.astype(np.int64), exclude=frozenset({T_DICT}))
    return d + i


def _dec_dict(payload: memoryview, count: int) -> np.ndarray:
    uniq, pos = decode_ints(payload, 0)
    idx, pos = decode_ints(payload, pos)
    if pos != len(payload):
        raise ValueError("dict: trailing payload bytes")
    if idx.size != count:
        raise ValueError("dict: index count mismatch")
    if idx.size and (idx.min() < 0 or idx.max() >= uniq.size):
        raise ValueError("dict: index out of range")
    return uniq[idx]


def run_lengths(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(run_values, run_lengths) — vectorized run detection via np.diff."""
    n = arr.size
    if n == 0:
        return arr[:0], np.zeros(0, dtype=np.int64)
    starts = np.empty(n, dtype=bool)
    starts[0] = True
    np.not_equal(arr[1:], arr[:-1], out=starts[1:])
    pos = np.flatnonzero(starts)
    vals = arr[pos]
    lens = np.diff(np.append(pos, n)).astype(np.int64)
    return vals, lens


def _enc_rle(arr: np.ndarray) -> bytes:
    vals, lens = run_lengths(arr)
    v = encode_ints(vals, codec=_pick_simple(vals))
    l = encode_ints(lens, exclude=frozenset({T_RLE, T_DICT}))
    return v + l


def _dec_rle(payload: memoryview, count: int) -> np.ndarray:
    vals, pos = decode_ints(payload, 0)
    lens, pos = decode_ints(payload, pos)
    if pos != len(payload):
        raise ValueError("rle: trailing payload bytes")
    if int(lens.sum()) != count:
        raise ValueError("rle: run lengths do not sum to element count")
    return np.repeat(vals, lens)


def _pick_simple(arr: np.ndarray) -> int:
    """Cheap inner-codec choice for nested segments (no recursion into the
    full selector): FORBP unless tiny, where RAW's zero overhead wins."""
    if arr.size <= 8:
        return T_RAW
    return T_FORBP


# ---------------------------------------------------------------------------
# Public encode/decode
# ---------------------------------------------------------------------------

_ENCODERS = {
    T_CONST: _enc_const,
    T_RAW: _enc_raw,
    T_ZBRA: _enc_zbra,
    T_FORBP: _enc_forbp,
    T_DELTA: _enc_delta,
    T_DICT: _enc_dict,
    T_RLE: _enc_rle,
}


def encode_ints(values, codec: int | None = None,
                exclude: frozenset[int] = frozenset()) -> bytes:
    """Encode an integer array as one segment. ``codec=None`` auto-selects
    via zseq.select (sampled stats). ``exclude`` removes codecs from the
    auto candidate set (used by nested segments to bound recursion)."""
    arr = _as_i64(values)
    n = arr.size
    if n == 0:
        return _seg(T_RAW, 0, b"")
    auto = codec is None
    if auto:
        from .. import select

        codec = select.select_int_codec(arr, exclude=exclude)
    if codec == T_CONST and int(arr.min()) != int(arr.max()):
        raise ValueError("const codec requires a constant array")
    if codec in (T_DELTA,) and n < 2:
        codec = T_RAW
    seg = _seg(codec, n, _ENCODERS[codec](arr))
    if auto and T_WRAP not in exclude:
        seg = _maybe_wrap(seg, n)
    return seg


def _maybe_wrap(seg: bytes, count: int) -> bytes:
    """Cascade compression: zstd the finished segment when it still has
    exploitable structure (e.g. periodic patterns no single codec models).
    A ~64 KiB trial bounds cost; kept only on a clear (>=10%) win."""
    if len(seg) < 128:
        return seg
    from .bytescodecs import zstd_compress

    trial = seg if len(seg) <= 65536 else seg[:65536]
    comp_trial = zstd_compress(np.frombuffer(trial, np.uint8))
    if len(comp_trial) > 0.85 * len(trial):
        return seg
    comp = comp_trial if trial is seg else zstd_compress(
        np.frombuffer(seg, np.uint8)
    )
    wrapped = _seg(
        T_WRAP, count, struct.pack("<I", len(seg)) + comp
    )
    return wrapped if len(wrapped) < 0.9 * len(seg) else seg


def decode_ints(buf, offset: int = 0) -> tuple[np.ndarray, int]:
    """Decode one segment from ``buf`` at ``offset``.

    Returns (int64 array, offset just past the segment)."""
    mv = memoryview(buf)
    tag, count, plen = HEADER.unpack_from(mv, offset)
    start = offset + HEADER.size
    end = start + plen
    if end > len(mv):
        raise ValueError("segment: truncated payload")
    payload = mv[start:end]
    if count == 0:
        return np.zeros(0, dtype=np.int64), end
    if tag == T_CONST:
        v = int.from_bytes(payload[0:8], "little", signed=True)
        return np.full(count, v, dtype=np.int64), end
    if tag == T_RAW:
        arr = np.frombuffer(payload, dtype="<i8")
        if arr.size != count:
            raise ValueError("raw: count mismatch")
        return arr.astype(np.int64, copy=True), end
    if tag == T_ZBRA:
        return P.zbra_decompress_int_array(payload, count), end
    if tag == T_FORBP:
        return _dec_forbp(payload, count), end
    if tag == T_DELTA:
        return _dec_delta(payload, count), end
    if tag == T_DICT:
        return _dec_dict(payload, count), end
    if tag == T_RLE:
        return _dec_rle(payload, count), end
    if tag == T_WRAP:
        from .bytescodecs import zstd_decompress

        (raw_len,) = struct.unpack_from("<I", payload, 0)
        inner = zstd_decompress(payload[4:], raw_len)
        vals, pos = decode_ints(inner, 0)
        if pos != len(inner):
            raise ValueError("zstd_wrap: trailing inner bytes")
        if vals.size != count:
            raise ValueError("zstd_wrap: count mismatch")
        return vals, end
    raise ValueError(f"unknown int codec tag 0x{tag:02x}")
