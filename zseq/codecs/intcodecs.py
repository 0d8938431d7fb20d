"""Integer column codecs over a self-describing recursive segment format.

Every encoded integer array is a *segment*:

    tag: u8 | payload_len: u32 LE | payload

The element count is NOT stored in the segment — it is always known from
context (the column chunk header, or a parent codec's own fields), which
keeps per-column framing smaller than the reference format's even though
zseq stores strictly more metadata elsewhere (type widths, crc, schema).

Segments nest (DICT's dictionary and indices are themselves segments),
which lets codecs compose — the per-column-codec design zbra documents as
FUTURE work (/root/reference/docs/design.md:222-302) built for real.

Codec family (all int64-domain, like zbra's pipeline; narrower physical
types are handled at the column layer):

  CONST   one value repeated                        (RLE degenerate case)
  RAW     8-byte LE each                            (incompressible fallback)
  ZBRA    the reference's exact FOR->ZZ->BP64 pipeline, byte-for-byte
          (/root/reference/zbra-core/src/compression.rs:271-292)
  PACK    whole-array min-frame-of-reference + bit-pack — like ZBRA but
          min-referenced (no zig-zag needed), no length duplication, and
          no >=32-bit efficiency cliff
  FORBP   mini-block min-FOR + bit-pack: per-1024-value blocks, per-block
          min and bit width — fixes the reference's known sharp edge where
          one outlier poisons a whole column's bit width
          (compression.rs:130-131; SURVEY.md §4.3)
  DELTA   first value + zig-zag'd successive deltas, sub-encoded
          (wins on sorted/monotonic data)
  DICT    sorted unique values + packed indices (low cardinality)
  RLE     run values + run lengths, each sub-encoded (repetitive data)
  WRAP    zstd over a finished segment (cascade; catches periodic
          structure no single codec models); carries the inner segment's
          derived zone map so pruning survives the wrap

Zone maps are *derived*, not stored: CONST/PACK/FORBP/ZBRA/DICT headers
already bound their values, so block pruning costs zero extra bytes
(``segment_zone``).

Decode is strict: truncated or trailing payload bytes raise, per the
rebuild contract (reference silently zero-fills, compression.rs:198-205).
"""

from __future__ import annotations

import struct

import numpy as np

from . import primitives as P

HEADER = struct.Struct("<BI")  # tag, payload_len

T_CONST = 0x01
T_RAW = 0x02
T_ZBRA = 0x03
T_FORBP = 0x04
T_DELTA = 0x05
T_DICT = 0x06
T_RLE = 0x07
T_WRAP = 0x08
T_PACK = 0x09

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
    T_PACK: "pack",
}
INT_CODEC_TAGS = {v: k for k, v in INT_CODEC_NAMES.items()}

_wrap = np.errstate(over="ignore")


def _seg(tag: int, payload: bytes) -> bytes:
    return HEADER.pack(tag, len(payload)) + payload


def _as_i64(values) -> np.ndarray:
    arr = np.asarray(values)
    if arr.dtype != np.int64:
        arr = arr.astype(np.int64)
    return np.ascontiguousarray(arr)


def _as_int(values) -> np.ndarray:
    """Keep int32 arrays narrow (the hot encode path: Arrow int32 token
    columns); widen everything else to int64. All codec byte layouts are
    int64-domain — the int32 fast paths below produce IDENTICAL bytes
    with half the memory traffic, verified by dtype-equivalence tests."""
    arr = np.asarray(values)
    if arr.dtype in (np.dtype(np.int32), np.dtype(np.int64)):
        return np.ascontiguousarray(arr)
    return _as_i64(arr)


# ---------------------------------------------------------------------------
# Individual codec payload encoders  (int64 ndarray -> payload bytes)
# ---------------------------------------------------------------------------

def _enc_const(arr: np.ndarray) -> bytes:
    return int(arr[0]).to_bytes(8, "little", signed=True)


def _enc_raw(arr: np.ndarray) -> bytes:
    return arr.astype("<i8").tobytes()


def _enc_zbra(arr: np.ndarray) -> bytes:
    return P.zbra_compress_int_array(arr)


def _enc_pack(arr: np.ndarray) -> bytes:
    """min i64 LE | width u8 | packed deltas (byte-aligned).
    width==0: all equal min. width==64: raw 8-byte deltas.

    int32 input stays in the 32-bit domain: (arr - lo) wraps mod 2^32,
    and the true deltas are < 2^32 by construction (int32 span), so the
    uint32 view is exact — same bytes, half the traffic."""
    lo = int(arr.min())
    if arr.dtype == np.int32:
        with _wrap:
            deltas = (arr - np.int32(lo)).view(np.uint32)
        hi = int(deltas.max())
        width = 0 if hi == 0 else hi.bit_length()
        head = int(lo).to_bytes(8, "little", signed=True) + bytes([width])
        if width == 0:
            return head
        return head + P.pack_width(deltas, width)
    with _wrap:
        deltas = (arr - np.int64(lo)).view(np.uint64)
    hi = int(deltas.max())
    width = 0 if hi == 0 else hi.bit_length()
    head = int(lo).to_bytes(8, "little", signed=True) + bytes([width])
    if width == 0:
        return head
    if width == 64:
        return head + deltas.astype("<u8").tobytes()
    return head + P.pack_width(deltas, width)


def _dec_pack(payload: memoryview, count: int,
              narrow: bool = False) -> np.ndarray:
    lo = int.from_bytes(payload[0:8], "little", signed=True)
    width = payload[8]
    if width == 0:
        if len(payload) != 9:
            raise ValueError("pack: trailing payload bytes")
        if narrow:
            return np.full(count, int(np.int64(lo).astype(np.int32)),
                           dtype=np.int32)
        return np.full(count, lo, dtype=np.int64)
    if width == 64:
        deltas = np.frombuffer(payload[9:], dtype="<u8")
        if deltas.size != count:
            raise ValueError("pack: raw delta count mismatch")
    else:
        nb = (count * width + 7) // 8
        if len(payload) != 9 + nb:
            raise ValueError("pack: payload size mismatch")
        deltas = P.unpack_width(payload[9:], count, width)
    with _wrap:
        if narrow:
            # mod-2^32 arithmetic == int64 decode + astype(int32)
            return (deltas.astype(np.uint32)
                    + np.uint32(lo & 0xFFFFFFFF)).view(np.int32)
        return (deltas + np.int64(lo).view(np.uint64)).view(np.int64)


def _enc_forbp(arr: np.ndarray, mini: int = MINI) -> bytes:
    """mini u16 | nminis x (min i64 LE, width u8) | packed minis
    (byte-aligned; nminis = ceil(count / mini), derived on decode).
    width==0: all equal min. width==64: raw 8-byte deltas.

    Vectorized over *runs* of consecutive same-width minis: after row
    clustering, chunks have long width runs, so packing happens in a few
    large pack_width calls instead of one per mini (same bytes out).

    int32 input runs entirely in the 32-bit domain ((v - min) wraps mod
    2^32; true deltas < 2^32 by int32-span construction, so the uint32
    view is exact) — identical bytes, half the memory traffic on the hot
    token-column path."""
    n = arr.size
    nminis = (n + mini - 1) // mini
    nfull = n // mini
    narrow = arr.dtype == np.int32
    udt = np.uint32 if narrow else np.uint64
    # Per-mini min/width, vectorized for the full minis.
    if nfull:
        g = arr[: nfull * mini].reshape(nfull, mini)
        mins_full = g.min(axis=1)
        with _wrap:
            deltas_full = (g - mins_full[:, None]).view(udt)
        maxd = deltas_full.max(axis=1)
        bl = np.zeros(nfull, dtype=np.int64)
        nz = maxd != 0
        if nz.any():
            if narrow:  # frexp exact for every value < 2^32
                bl[nz] = np.frexp(maxd[nz].astype(np.float64))[1]
            else:
                bl[nz] = np.frexp(
                    np.clip(maxd[nz], 0,
                            (1 << 53) - 1).astype(np.float64))[1]
                big = maxd[nz] >= (1 << 53)
                if big.any():  # exact bit_length for the huge tail
                    idx = np.flatnonzero(nz)[big]
                    bl[idx] = [int(maxd[i]).bit_length() for i in idx]
    mins = np.empty(nminis, dtype=np.int64)
    widths = np.empty(nminis, dtype=np.int64)
    if nfull:
        mins[:nfull] = mins_full
        widths[:nfull] = bl
    tail_d = None
    if nminis > nfull:  # trailing partial mini
        blk = arr[nfull * mini:]
        lo = int(blk.min())
        with _wrap:
            tail_d = (blk - blk.dtype.type(lo)).view(udt)
        hi = int(tail_d.max())
        mins[-1] = lo
        widths[-1] = 0 if hi == 0 else hi.bit_length()
    heads = np.empty((nminis, 9), dtype=np.uint8)
    heads[:, :8] = mins.astype("<i8").view(np.uint8).reshape(nminis, 8)
    heads[:, 8] = widths
    bodies = []
    # Pack runs of equal width among the full minis in one call each.
    m = 0
    while m < nfull:
        w = int(widths[m])
        e = m + 1
        while e < nfull and widths[e] == w:
            e += 1
        if w == 64:
            bodies.append(deltas_full[m:e].reshape(-1).astype("<u8").tobytes())
        elif w > 0:
            if (mini * w) % 8 == 0:
                bodies.append(P.pack_width(deltas_full[m:e].reshape(-1), w))
            else:  # minis are individually byte-aligned; pack one by one
                for i in range(m, e):
                    bodies.append(P.pack_width(deltas_full[i], w))
        m = e
    if nminis > nfull:
        w = int(widths[-1])
        d = tail_d  # computed once with the width above
        if w == 64:
            bodies.append(d.astype("<u8").tobytes())
        elif w > 0:
            bodies.append(P.pack_width(d, w))
    return struct.pack("<H", mini) + heads.tobytes() + b"".join(bodies)


def _dec_forbp(payload: memoryview, count: int,
               narrow: bool = False) -> np.ndarray:
    (mini,) = struct.unpack_from("<H", payload, 0)
    if mini == 0:
        raise ValueError("forbp: zero mini-block size")
    nminis = (count + mini - 1) // mini
    nfull = count // mini
    heads = np.frombuffer(payload[2 : 2 + 9 * nminis],
                          dtype=np.uint8).reshape(nminis, 9)
    mins = np.ascontiguousarray(heads[:, :8]).view("<i8").reshape(nminis)
    widths = heads[:, 8].astype(np.int64)
    pos = 2 + 9 * nminis
    if narrow:
        return _dec_forbp_narrow(payload, count, mini, nminis, nfull,
                                 mins, widths, pos)
    out = np.empty(count, dtype=np.int64)
    # Decode runs of equal width among full minis in one unpack each.
    m = 0
    while m < nfull:
        w = int(widths[m])
        e = m + 1
        while e < nfull and widths[e] == w:
            e += 1
        nvals = (e - m) * mini
        lo_idx = m * mini
        if w == 0:
            deltas = np.zeros(nvals, dtype=np.uint64)
        elif w == 64:
            nb = nvals * 8
            deltas = np.frombuffer(payload[pos : pos + nb], dtype="<u8")
            if deltas.size != nvals:
                raise ValueError("forbp: truncated raw mini-block")
            pos += nb
        else:
            # Minis are byte-aligned individually; for full minis each
            # occupies exactly mini*w/8... only when mini*w % 8 == 0,
            # which holds for the power-of-two MINI. Otherwise fall back
            # to per-mini.
            per = (mini * w + 7) // 8
            if per * 8 != mini * w:
                for i in range(m, e):
                    d = P.unpack_width(
                        payload[pos : pos + per], mini, w)
                    with _wrap:
                        out[i * mini : (i + 1) * mini] = (
                            d + mins[i].view(np.uint64)).view(np.int64)
                    pos += per
                m = e
                continue
            nb = per * (e - m)
            deltas = P.unpack_width(payload[pos : pos + nb], nvals, w)
            pos += nb
        with _wrap:
            out[lo_idx : lo_idx + nvals] = (
                deltas.reshape(e - m, mini)
                + mins[m:e].view(np.uint64)[:, None]
            ).reshape(-1).view(np.int64)
        m = e
    if nminis > nfull:
        blk_n = count - nfull * mini
        w = int(widths[-1])
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
            out[nfull * mini :] = (
                deltas + mins[-1].view(np.uint64)).view(np.int64)
    if pos != len(payload):
        raise ValueError(
            f"forbp: trailing payload bytes ({len(payload) - pos})"
        )
    return out


def _dec_forbp_narrow(payload, count, mini, nminis, nfull, mins, widths,
                      pos) -> np.ndarray:
    """int32 output path of FORBP decode: identical values to the int64
    path truncated with astype(int32) (all arithmetic is exact mod
    2^32), at half the memory traffic. Mirrors the run structure of the
    int64 body byte for byte."""
    mins32 = mins.astype(np.uint32)  # wraps mod 2^32 — exactly astype
    out = np.empty(count, dtype=np.int32)
    out32 = out.view(np.uint32)
    m = 0
    while m < nfull:
        w = int(widths[m])
        e = m + 1
        while e < nfull and widths[e] == w:
            e += 1
        nvals = (e - m) * mini
        lo_idx = m * mini
        if w == 0:
            deltas = np.zeros(nvals, dtype=np.uint32)
        elif w == 64:
            nb = nvals * 8
            d64 = np.frombuffer(payload[pos : pos + nb], dtype="<u8")
            if d64.size != nvals:
                raise ValueError("forbp: truncated raw mini-block")
            pos += nb
            deltas = d64.astype(np.uint32)
        else:
            per = (mini * w + 7) // 8
            if per * 8 != mini * w:
                for i in range(m, e):
                    d = P.unpack_width(payload[pos : pos + per], mini, w)
                    with _wrap:
                        out32[i * mini : (i + 1) * mini] = (
                            d.astype(np.uint32) + mins32[i])
                    pos += per
                m = e
                continue
            nb = per * (e - m)
            deltas = P.unpack_width(
                payload[pos : pos + nb], nvals, w).astype(np.uint32)
            pos += nb
        with _wrap:
            out32[lo_idx : lo_idx + nvals] = (
                deltas.reshape(e - m, mini) + mins32[m:e, None]
            ).reshape(-1)
        m = e
    if nminis > nfull:
        blk_n = count - nfull * mini
        w = int(widths[-1])
        if w == 0:
            deltas = np.zeros(blk_n, dtype=np.uint32)
        elif w == 64:
            nb = blk_n * 8
            d64 = np.frombuffer(payload[pos : pos + nb], dtype="<u8")
            if d64.size != blk_n:
                raise ValueError("forbp: truncated raw mini-block")
            pos += nb
            deltas = d64.astype(np.uint32)
        else:
            nb = (blk_n * w + 7) // 8
            deltas = P.unpack_width(
                payload[pos : pos + nb], blk_n, w).astype(np.uint32)
            pos += nb
        with _wrap:
            out32[nfull * mini :] = deltas + mins32[-1]
    if pos != len(payload):
        raise ValueError(
            f"forbp: trailing payload bytes ({len(payload) - pos})"
        )
    return out


def _enc_delta(arr: np.ndarray) -> bytes:
    """first i64 | min i64 | max i64 | zig-zag'd diffs sub-segment.
    min/max exist solely for the derived zone map (DELTA is the codec of
    sorted key columns — exactly where block pruning pays)."""
    with _wrap:
        diffs = np.diff(arr)
    zz = P.zigzag_encode(diffs).view(np.int64)
    sub = encode_ints(zz, exclude=frozenset({T_DELTA}))
    head = b"".join(
        int(v).to_bytes(8, "little", signed=True)
        for v in (arr[0], arr.min(), arr.max())
    )
    return head + sub


def _dec_delta(payload: memoryview, count: int) -> np.ndarray:
    first = int.from_bytes(payload[0:8], "little", signed=True)
    zz, pos = decode_ints(payload, 24, count - 1)
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
    return struct.pack("<I", uniq.size) + d + i


def _dec_dict(payload: memoryview, count: int,
              dtype=np.int64) -> np.ndarray:
    (card,) = struct.unpack_from("<I", payload, 0)
    uniq, pos = decode_ints(payload, 4, card)
    # indices stay int64: a narrow decode would wrap a corrupt >= 2^32
    # index into range and weaken the strict bounds check below
    idx, pos = decode_ints(payload, pos, count)
    if pos != len(payload):
        raise ValueError("dict: trailing payload bytes")
    if idx.size and (idx.min() < 0 or idx.max() >= uniq.size):
        raise ValueError("dict: index out of range")
    if dtype == np.int32:
        return uniq.astype(np.int32)[idx]
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
    return struct.pack("<I", vals.size) + v + l


def _dec_rle(payload: memoryview, count: int,
             dtype=np.int64) -> np.ndarray:
    (nruns,) = struct.unpack_from("<I", payload, 0)
    vals, pos = decode_ints(payload, 4, nruns)
    lens, pos = decode_ints(payload, pos, nruns)
    if pos != len(payload):
        raise ValueError("rle: trailing payload bytes")
    if int(lens.sum()) != count:
        raise ValueError("rle: run lengths do not sum to element count")
    if dtype == np.int32:
        return np.repeat(vals.astype(np.int32), lens)
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
    T_PACK: _enc_pack,
    T_FORBP: _enc_forbp,
    T_DELTA: _enc_delta,
    T_DICT: _enc_dict,
    T_RLE: _enc_rle,
}

# Encoders whose byte output is identical for int32 input without
# widening (PACK/FORBP have explicit 32-bit domains; CONST/RAW/DICT/RLE
# widen internally only where the format needs int64 bytes; ZBRA widens
# inside the reference kernel). DELTA's wrapping np.diff is int64-domain
# semantics, so it is widened before encode.
_NARROW_OK = frozenset({T_CONST, T_RAW, T_ZBRA, T_PACK, T_FORBP,
                        T_DICT, T_RLE})


def encode_ints(values, codec: int | None = None,
                exclude: frozenset[int] = frozenset()) -> bytes:
    """Encode an integer array as one segment. ``codec=None`` auto-selects
    via zseq.select (sampled stats). ``exclude`` removes codecs from the
    auto candidate set (used by nested segments to bound recursion)."""
    arr = _as_int(values)
    n = arr.size
    if n == 0:
        return _seg(T_RAW, b"")
    auto = codec is None
    if auto:
        from .. import select

        codec = select.select_int_codec(arr, exclude=exclude)
    if codec == T_CONST and int(arr.min()) != int(arr.max()):
        raise ValueError("const codec requires a constant array")
    if codec in (T_DELTA,) and n < 2:
        codec = T_RAW
    if arr.dtype != np.int64 and codec not in _NARROW_OK:
        arr = arr.astype(np.int64)  # codecs with int64-domain byte paths
    seg = _seg(codec, _ENCODERS[codec](arr))
    if auto and T_WRAP not in exclude:
        seg = _maybe_wrap(seg, n)
    return seg


def _maybe_wrap(seg: bytes, count: int) -> bytes:
    """Cascade compression: zstd the finished segment when it still has
    exploitable structure (e.g. periodic patterns no single codec models).
    A ~64 KiB trial bounds cost; kept only on a clear (>=10%) win. The
    inner segment's derived zone map rides in the wrap header so block
    pruning still works on wrapped chunks."""
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
    zone = segment_zone(seg, 0, count)
    zhead = (
        struct.pack("<Bqq", 1, zone[0], zone[1]) if zone
        else struct.pack("<B", 0)
    )
    wrapped = _seg(T_WRAP, struct.pack("<I", len(seg)) + zhead + comp)
    return wrapped if len(wrapped) < 0.9 * len(seg) else seg


def decode_ints(buf, offset: int, count: int,
                dtype=np.int64) -> tuple[np.ndarray, int]:
    """Decode one segment of ``count`` elements from ``buf`` at ``offset``.

    Returns (array of ``dtype``, offset just past the segment).

    ``dtype`` may be np.int32 for columns whose physical width is <= 32
    bits: every value is then produced mod 2^32 — bit-identical to
    decoding in int64 and truncating with astype (C cast semantics), at
    half the memory traffic. PACK/FORBP/CONST/RAW/DICT/RLE/WRAP have
    direct 32-bit paths; DELTA/ZBRA decode in int64 and truncate."""
    mv = memoryview(buf)
    tag, plen = HEADER.unpack_from(mv, offset)
    start = offset + HEADER.size
    end = start + plen
    if end > len(mv):
        raise ValueError("segment: truncated payload")
    payload = mv[start:end]
    narrow = dtype == np.int32
    if count == 0:
        if plen:
            raise ValueError("segment: payload for zero elements")
        return np.zeros(0, dtype=dtype), end
    if tag == T_CONST:
        if plen != 8:
            # strict decode (module contract): a 3-byte payload would
            # otherwise silently decode to a wrong value
            raise ValueError("const: payload must be exactly 8 bytes")
        v = int.from_bytes(payload[0:8], "little", signed=True)
        if narrow:
            v = int(np.int64(v).astype(np.int32))
        return np.full(count, v, dtype=dtype), end
    if tag == T_RAW:
        arr = np.frombuffer(payload, dtype="<i8")
        if arr.size != count:
            raise ValueError("raw: count mismatch")
        return arr.astype(dtype, copy=True), end
    if tag == T_ZBRA:
        out = P.zbra_decompress_int_array(payload, count)
        if out.size != count:
            raise ValueError("zbra_pipe: count mismatch")
        return out.astype(np.int32) if narrow else out, end
    if tag == T_PACK:
        return _dec_pack(payload, count, narrow), end
    if tag == T_FORBP:
        return _dec_forbp(payload, count, narrow), end
    if tag == T_DELTA:
        out = _dec_delta(payload, count)
        return out.astype(np.int32) if narrow else out, end
    if tag == T_DICT:
        return _dec_dict(payload, count, dtype), end
    if tag == T_RLE:
        return _dec_rle(payload, count, dtype), end
    if tag == T_WRAP:
        from .bytescodecs import zstd_decompress

        (raw_len,) = struct.unpack_from("<I", payload, 0)
        has_zone = payload[4]
        skip = 5 + (16 if has_zone else 0)
        inner = zstd_decompress(payload[skip:], raw_len)
        vals, pos = decode_ints(inner, 0, count, dtype)
        if pos != len(inner):
            raise ValueError("zstd_wrap: trailing inner bytes")
        return vals, end
    raise ValueError(f"unknown int codec tag 0x{tag:02x}")


# ---------------------------------------------------------------------------
# Derived zone maps — no stored stats, bounds read off codec headers.
# ---------------------------------------------------------------------------

def segment_zone(buf, offset: int, count: int) -> tuple[int, int] | None:
    """Conservative (min, max) bound of the segment's values, or None when
    the codec's header does not bound them. Never decodes payload data."""
    mv = memoryview(buf)
    tag, plen = HEADER.unpack_from(mv, offset)
    payload = mv[offset + HEADER.size : offset + HEADER.size + plen]
    if count == 0:
        return None
    if tag == T_CONST:
        if len(payload) < 8:
            return None
        v = int.from_bytes(payload[0:8], "little", signed=True)
        return (v, v)
    I64_MAX = (1 << 63) - 1
    if tag == T_PACK:
        if len(payload) < 9:
            return None
        lo = int.from_bytes(payload[0:8], "little", signed=True)
        w = payload[8]
        if w >= 64:
            return None
        return (lo, min(lo + (1 << w) - 1, I64_MAX))
    if tag == T_FORBP:
        if len(payload) < 2:
            return None
        (mini,) = struct.unpack_from("<H", payload, 0)
        if mini == 0:
            return None
        nminis = (count + mini - 1) // mini
        if 2 + 9 * nminis > len(payload):
            # Short/corrupt header region: no pruning (decode will raise).
            return None
        # Vectorized header walk (runs per block write for the part
        # envelope): mins i64 LE + width u8, stride 9.
        heads = np.frombuffer(payload, dtype=np.uint8,
                              offset=2, count=9 * nminis).reshape(nminis, 9)
        mins = np.ascontiguousarray(heads[:, :8]).view("<i8").reshape(-1)
        widths = heads[:, 8].astype(np.int64)
        if (widths >= 64).any():
            return None
        lo_all = int(mins.min())
        with np.errstate(over="ignore"):
            spans = np.where(widths > 0,
                             (np.int64(1) << widths) - np.int64(1),
                             np.int64(0))
            his = mins + spans  # may exceed I64_MAX conceptually; clamp
        # exact python-int clamp for minis whose span wrapped past i64
        wrap = (his < mins)
        if wrap.any():
            hi_all = max(min(int(m) + (1 << int(w)) - 1, I64_MAX)
                         for m, w in zip(mins[wrap], widths[wrap]))
            ok = ~wrap
            if ok.any():
                hi_all = max(hi_all, int(his[ok].max()))
        else:
            hi_all = int(his.max())
        return (lo_all, hi_all)
    if tag == T_ZBRA:
        if plen < 13:
            return None
        mid = int.from_bytes(payload[0:8], "little", signed=True)
        w = payload[12]  # first packed byte = bit width
        if w >= 32:
            return None
        half = 1 << max(0, w - 1)
        lo, hi = mid - half, mid + half
        if lo < -(1 << 63) or hi > I64_MAX:
            return None  # decode wraps near the i64 extremes — no bound
        return (lo, hi)
    if tag == T_DICT:
        if len(payload) < 4:
            return None
        (card,) = struct.unpack_from("<I", payload, 0)
        return segment_zone(payload, 4, card)
    if tag == T_WRAP:
        if len(payload) >= 21 and payload[4]:
            lo, hi = struct.unpack_from("<qq", payload, 5)
            return (lo, hi)
        return None
    if tag == T_DELTA:
        if len(payload) < 24:
            return None
        lo = int.from_bytes(payload[8:16], "little", signed=True)
        hi = int.from_bytes(payload[16:24], "little", signed=True)
        return (lo, hi)
    return None
