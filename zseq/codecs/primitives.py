"""Primitive integer-compression kernels, vectorized in numpy.

These reproduce the exact semantics (including wrapping int64 arithmetic and
byte layouts) of the reference's scalar Rust kernels so that (a) roundtrip
property tests carry over 1:1 and (b) the size oracle in zseq.oracle is
byte-exact. Reference: /root/reference/zbra-core/src/compression.rs
(frame_of_reference_encode :52-74, zig_zag_encode :88-98, bp64_pack
:117-178, compress_int_array :271-292).

All kernels are pure ``np.ndarray -> np.ndarray`` / bytes functions with no
Spark dependency; the Spark layer calls them from inside ``mapInArrow``.
"""

from __future__ import annotations

import numpy as np

_U64_1 = np.uint64(1)
_U64_8 = np.uint64(8)

# numpy int64 overflow wraps two's-complement exactly like Rust's
# wrapping_add/wrapping_sub, but emits RuntimeWarnings — suppress on purpose.
_wrap = np.errstate(over="ignore")


def _as_i64(values) -> np.ndarray:
    arr = np.asarray(values)
    if arr.dtype != np.int64:
        arr = arr.astype(np.int64)
    return arr


# ---------------------------------------------------------------------------
# Frame-of-reference (reference compression.rs:52-82) — median reference.
# ---------------------------------------------------------------------------

def for_reference(values: np.ndarray) -> int:
    """Median midpoint, replicating the reference's overflow-safe formula.

    Even length: ``a.wrapping_add(b.wrapping_sub(a) / 2)`` where ``/`` is
    Rust signed division (truncation toward zero) — compression.rs:60-68.
    """
    arr = _as_i64(values)
    n = arr.size
    if n == 0:
        return 0
    if n % 2 == 1:
        # np.partition is O(n); the reference full-sorts but only the
        # midpoint value matters (SURVEY.md §4.3).
        return int(np.partition(arr, n // 2)[n // 2])
    part = np.partition(arr, [n // 2 - 1, n // 2])
    a = int(part[n // 2 - 1])
    b = int(part[n // 2])
    d = _wrap_i64(b - a)
    half = -((-d) // 2) if d < 0 else d // 2  # trunc toward zero
    return _wrap_i64(a + half)


def _wrap_i64(x: int) -> int:
    """Wrap a python int to two's-complement int64."""
    x &= (1 << 64) - 1
    return x - (1 << 64) if x >= (1 << 63) else x


def for_encode(values: np.ndarray) -> tuple[int, np.ndarray]:
    """(midpoint, wrapping deltas) — compression.rs:52-74."""
    arr = _as_i64(values)
    if arr.size == 0:
        return 0, arr
    mid = for_reference(arr)
    with _wrap:
        deltas = arr - np.int64(mid)
    return mid, deltas


def for_decode(midpoint: int, deltas: np.ndarray) -> np.ndarray:
    """Wrapping add — compression.rs:77-82."""
    arr = _as_i64(deltas)
    with _wrap:
        return arr + np.int64(midpoint)


# ---------------------------------------------------------------------------
# Zig-zag (reference compression.rs:88-111).
# ---------------------------------------------------------------------------

def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """(n << 1) ^ (n >> 63) on int64 -> uint64."""
    arr = _as_i64(values)
    u = arr.view(np.uint64)
    sign = (arr >> 63).view(np.uint64)  # arithmetic shift: 0 or all-ones
    with _wrap:
        return ((u << _U64_1) ^ sign)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    """(n >> 1) ^ -(n & 1) on uint64 -> int64."""
    u = np.asarray(values, dtype=np.uint64)
    shifted = (u >> _U64_1).view(np.int64)
    sign = (u & _U64_1).view(np.int64)
    return shifted ^ -sign


# ---------------------------------------------------------------------------
# BP64 bit-packing (reference compression.rs:117-233).
# LSB-first bitstream, 1-byte width header per array, >=32-bit width falls
# back to raw 8-byte LE storage (the "efficiency cliff" the reference's
# Date validation limit exists to avoid).
# ---------------------------------------------------------------------------

def bit_width_u64(max_value: int) -> int:
    """64 - clz(max); 1 when max == 0 (compression.rs:123-128)."""
    if max_value == 0:
        return 1
    return int(max_value).bit_length()


def bp64_pack(values: np.ndarray) -> bytes:
    u = np.ascontiguousarray(values, dtype=np.uint64)
    if u.size == 0:
        return b""
    width = bit_width_u64(int(u.max()))
    if width >= 32:
        return bytes([width]) + u.tobytes()  # raw 8-byte LE fallback
    return bytes([width]) + pack_width(u, width)


def bp64_unpack(packed: bytes | memoryview, count: int) -> np.ndarray:
    buf = memoryview(packed)
    if len(buf) == 0:
        if count:
            # strict decode: an empty payload promising values would
            # otherwise return a short array that callers silently use.
            # (A WIDTH-0 header with count values is different and
            # legitimate: the reference encodes all-zero deltas that way.)
            raise ValueError("bp64: empty payload for nonzero count")
        return np.zeros(0, dtype=np.uint64)
    width = buf[0]
    if width == 0 or count == 0:
        return np.zeros(count, dtype=np.uint64)
    data = buf[1:]
    if width >= 32:
        need = count * 8
        if len(data) < need:
            raise ValueError(
                f"bp64: truncated raw payload ({len(data)} < {need} bytes)"
            )
        return np.frombuffer(data[:need], dtype="<u8").copy()
    return unpack_width(data, count, width)


def _pack_width_lanes(u: np.ndarray, width: int) -> bytes:
    """Reference lane implementation (any width): packs groups of 8
    values into little-endian uint64 lanes with one strided pass per
    value position. Kept as the wide-width (>= 33) path and as the
    byte-layout oracle the fast tree path is property-tested against."""
    n = u.size
    if n == 0 or width == 0:
        return b""
    ngroups = (n + 7) // 8
    if ngroups * 8 != n:
        g = np.zeros(ngroups * 8, dtype=np.uint64)
        g[:n] = u
    else:
        g = np.ascontiguousarray(u, dtype=np.uint64)
    g = g.reshape(ngroups, 8)
    nlanes = (8 * width + 63) // 64
    lanes = np.zeros((ngroups, nlanes), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(8):
            start = k * width
            lane, off = divmod(start, 64)
            off_u = np.uint64(off)
            lanes[:, lane] |= g[:, k] << off_u
            if off + width > 64:
                lanes[:, lane + 1] |= g[:, k] >> np.uint64(64 - off)
    # Little-endian lane bytes; keep the first `width` bytes per group,
    # then trim to the exact reference byte count.
    by = lanes.view("<u8").view(np.uint8).reshape(ngroups, nlanes * 8)
    out = np.ascontiguousarray(by[:, :width]).reshape(-1)
    return out[: (n * width + 7) // 8].tobytes()


def pack_width(u: np.ndarray, width: int) -> bytes:
    """Pack unsigned values at ``width`` bits each, LSB-first, vectorized.

    Byte layout is identical to the reference's scalar bit-buffer loop
    (compression.rs:152-177). For widths <= 32 (the overwhelmingly common
    case: token ids, lengths, FOR deltas) values are combined pairwise in
    the narrowest dtype that holds them — a log2(8)=3-level tree of
    CONTIGUOUS shift/or passes — instead of 8 strided per-position passes
    over 64-bit lanes. The codec path is memory-bandwidth-bound at high
    core counts, and the tree cuts its traffic ~4x (measured ~3-4x wall
    on the packing step). ``u`` may be any unsigned/int64 dtype whose
    values fit ``width`` bits; widths >= 33 take the lane path.
    """
    n = u.size
    if n == 0 or width == 0:
        return b""
    if width >= 33:
        return _pack_width_lanes(u, width)
    w = width
    ngroups = (n + 7) // 8
    dt = np.uint8 if w <= 8 else (np.uint16 if w <= 16 else np.uint32)
    if ngroups * 8 != n:
        g = np.zeros(ngroups * 8, dtype=dt)
        g[:n] = u.astype(dt) if u.dtype != dt else u
    else:
        g = u.astype(dt) if u.dtype != dt else np.ascontiguousarray(u)
    with np.errstate(over="ignore"):
        if w <= 8:
            # 8 bytes -> 1 uint64 lane in 3 contiguous combine passes.
            v16 = g.view(np.uint16)
            v16 = (v16 & np.uint16(0xFF)) | (
                (v16 >> np.uint16(8)) << np.uint16(w))
            v32 = v16.view(np.uint32)
            v32 = (v32 & np.uint32(0xFFFF)) | (
                (v32 >> np.uint32(16)) << np.uint32(2 * w))
            v64 = v32.view(np.uint64)
            lane = (v64 & np.uint64(0xFFFFFFFF)) | (
                (v64 >> np.uint64(32)) << np.uint64(4 * w))
            by = lane.view(np.uint8).reshape(ngroups, 8)
            out = np.ascontiguousarray(by[:, :w]).reshape(-1)
        elif w <= 16:
            v32 = g.view(np.uint32)
            v32 = (v32 & np.uint32(0xFFFF)) | (
                (v32 >> np.uint32(16)) << np.uint32(w))
            v64 = v32.view(np.uint64)
            v64 = (v64 & np.uint64(0xFFFFFFFF)) | (
                (v64 >> np.uint64(32)) << np.uint64(2 * w))
            # two lanes per group, lane1 starts at bit 4w of the 8w-bit
            # group stream
            s = 4 * w
            if s % 8 == 0:
                nb = s // 8
                byv = v64.view(np.uint8).reshape(ngroups, 2, 8)
                outm = np.empty((ngroups, w), dtype=np.uint8)
                outm[:, :nb] = byv[:, 0, :nb]
                outm[:, nb:] = byv[:, 1, :nb]
                out = outm.reshape(-1)
            else:
                L = v64.reshape(ngroups, 2)
                pair = np.empty((ngroups, 2), dtype=np.uint64)
                pair[:, 0] = L[:, 0] | (L[:, 1] << np.uint64(s))
                pair[:, 1] = L[:, 1] >> np.uint64(64 - s)
                out = np.ascontiguousarray(
                    pair.view(np.uint8).reshape(ngroups, 16)[:, :w]
                ).reshape(-1)
        else:
            v64 = g.view(np.uint64)
            v64 = (v64 & np.uint64(0xFFFFFFFF)) | (
                (v64 >> np.uint64(32)) << np.uint64(w))
            # four lanes per group of 2w bits each; assemble the 8w-bit
            # (<= 256) group stream in 4 out-words
            L = v64.reshape(ngroups, 4)
            words = np.zeros((ngroups, 4), dtype=np.uint64)
            for j in range(4):
                s = j * 2 * w
                t0, off = divmod(s, 64)
                words[:, t0] |= L[:, j] << np.uint64(off)
                if off + 2 * w > 64:
                    words[:, t0 + 1] |= L[:, j] >> np.uint64(64 - off)
            out = np.ascontiguousarray(
                words.view(np.uint8).reshape(ngroups, 32)[:, :w]
            ).reshape(-1)
    return out[: (n * w + 7) // 8].tobytes()


def _unpack_width_lanes(data, count: int, width: int) -> np.ndarray:
    """Reference lane implementation of unpack (any width) — the wide
    (>= 33) path and the tree path's test oracle."""
    nbits = count * width
    nbytes = (nbits + 7) // 8
    raw = np.frombuffer(data, dtype=np.uint8, count=-1)
    if raw.size < nbytes:
        raise ValueError(
            f"bitpack: truncated payload ({raw.size} < {nbytes} bytes)"
        )
    ngroups = (count + 7) // 8
    nlanes = (8 * width + 63) // 64
    by = np.zeros((ngroups, nlanes * 8), dtype=np.uint8)
    flat = by[:, :width].reshape(-1)
    flat[:nbytes] = raw[:nbytes]
    by[:, :width] = flat.reshape(ngroups, width)
    lanes = np.ascontiguousarray(by).view("<u8").reshape(ngroups, nlanes)
    vals = np.empty((ngroups, 8), dtype=np.uint64)
    mask = np.uint64((1 << width) - 1)
    with np.errstate(over="ignore"):
        for k in range(8):
            start = k * width
            lane, off = divmod(start, 64)
            v = lanes[:, lane] >> np.uint64(off)
            if off + width > 64:
                v |= lanes[:, lane + 1] << np.uint64(64 - off)
            vals[:, k] = v & mask
    return vals.reshape(-1)[:count]


def unpack_width(data, count: int, width: int) -> np.ndarray:
    """Inverse of pack_width; strict about truncation (unlike the
    reference, which silently yields zeros — compression.rs:198-205;
    SURVEY.md §4.3 says decode must be strict in the rebuild). The lane
    implementation measures FASTER than a tree split here: each of its 8
    passes touches only ngroups-sized arrays and it materializes uint64
    output directly, where a split tree pays doubling-size temporaries
    plus a final widen — measured 1.5-7x slower, so unpack keeps lanes."""
    return _unpack_width_lanes(data, count, width)


# ---------------------------------------------------------------------------
# zbra's full int pipeline (compression.rs:271-330): FOR -> zigzag -> BP64,
# layout = midpoint(8B LE) + packed_len(4B LE) + packed. Kept byte-exact:
# it is both a usable codec and the reference size oracle's core.
# ---------------------------------------------------------------------------

def zbra_compress_int_array(values: np.ndarray) -> bytes:
    arr = _as_i64(values)
    if arr.size == 0:
        return b""
    mid, deltas = for_encode(arr)
    zz = zigzag_encode(deltas)
    packed = bp64_pack(zz)
    head = int(mid).to_bytes(8, "little", signed=True)
    return head + len(packed).to_bytes(4, "little") + packed


def zbra_decompress_int_array(data: bytes | memoryview, count: int) -> np.ndarray:
    buf = memoryview(data)
    if len(buf) == 0:
        if count:
            raise ValueError(
                "zbra int pipeline: empty payload for nonzero count")
        return np.zeros(0, dtype=np.int64)
    if len(buf) < 12:
        raise ValueError("zbra int pipeline: invalid compressed data length")
    mid = int.from_bytes(buf[0:8], "little", signed=True)
    packed_len = int.from_bytes(buf[8:12], "little")
    if len(buf) < 12 + packed_len:
        raise ValueError("zbra int pipeline: insufficient data for packed array")
    zz = bp64_unpack(buf[12 : 12 + packed_len], count)
    deltas = zigzag_decode(zz)
    return for_decode(mid, deltas)


def zbra_compressed_size(values: np.ndarray) -> int:
    """Exact size in bytes of zbra's compress_int_array output, computed
    without materializing the payload (for the size oracle)."""
    arr = _as_i64(values)
    n = arr.size
    if n == 0:
        return 0
    mid, deltas = for_encode(arr)
    zz = zigzag_encode(deltas)
    width = bit_width_u64(int(zz.max())) if n else 1
    packed = 1 + (n * 8 if width >= 32 else (n * width + 7) // 8)
    return 8 + 4 + packed
