"""Binary (string/bytes) column codecs.

A binary column is (lengths: int64[n], data: concatenated uint8) — the same
lengths+data decomposition as the reference's striped Binary column
(/root/reference/zbra-core/src/striped.rs:41-46). Encoded as a segment:

    tag: u8 | payload_len: u32 LE | payload

(the value count comes from context, like all zseq segments).

Codecs:
  BIN_RAW    lengths segment + raw bytes
  BIN_ZSTD   lengths segment + zstd-compressed bytes (the reference's only
             string codec, level 3 — compression.rs:34-41, binary.rs:302-313)
  BIN_DICT   distinct values as a nested BIN_* segment + int indices segment
  BIN_FSST   FSST symbol-table compression (codecs/fsst.py)
  BIN_CONST  every row identical

Selection is trial-based on a strided ~64 KiB sample: cheap, and far more
robust than closed-form size models for byte payloads.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from . import fsst
from . import intcodecs as IC

T_BIN_RAW = 0x10
T_BIN_ZSTD = 0x11
T_BIN_DICT = 0x12
T_BIN_FSST = 0x13
T_BIN_CONST = 0x14

BIN_CODEC_NAMES = {
    T_BIN_RAW: "bin_raw",
    T_BIN_ZSTD: "bin_zstd",
    T_BIN_DICT: "bin_dict",
    T_BIN_FSST: "bin_fsst",
    T_BIN_CONST: "bin_const",
}
BIN_CODEC_TAGS = {v: k for k, v in BIN_CODEC_NAMES.items()}

# Compression level: the reference default is 3, configurable 1-22
# (compression.rs:14-23 Zstd{level}, :34-41 default). The level is an
# encode-time knob only — zstd frames are self-describing, so decode
# never needs it (it is still recorded in the encode manifest).
ZSTD_LEVEL = 3
_zstd_codecs: dict[int, pa.Codec] = {}

SAMPLE_BYTES = 1 << 16
FSST_MAX_MEAN_LEN = 128.0


def validate_zstd_level(level: int | None) -> None:
    """The one range check every entry point shares (1-22 or None)."""
    if level is not None and not 1 <= int(level) <= 22:
        raise ValueError(f"zstd level must be in [1, 22]: {level}")


def set_zstd_level(level: int) -> None:
    """Set the module-wide zstd compression level (1-22). Called inside
    encode workers from the level captured in the job closure."""
    global ZSTD_LEVEL
    validate_zstd_level(level)
    if level is None:
        raise ValueError("zstd level must not be None")
    ZSTD_LEVEL = int(level)


def _zstd() -> pa.Codec:
    c = _zstd_codecs.get(ZSTD_LEVEL)
    if c is None:
        c = _zstd_codecs[ZSTD_LEVEL] = pa.Codec(
            "zstd", compression_level=ZSTD_LEVEL)
    return c


def zstd_compress(data: bytes | np.ndarray) -> bytes:
    buf = data.tobytes() if isinstance(data, np.ndarray) else bytes(data)
    return _zstd().compress(buf, asbytes=True)


def zstd_decompress(data, raw_size: int) -> bytes:
    return _zstd().decompress(bytes(data), decompressed_size=raw_size,
                              asbytes=True)


def _seg(tag: int, payload: bytes) -> bytes:
    return IC.HEADER.pack(tag, len(payload)) + payload


def _offsets(lengths: np.ndarray) -> np.ndarray:
    out = np.zeros(lengths.size + 1, dtype=np.int64)
    np.cumsum(lengths, out=out[1:])
    return out


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------

def _enc_raw(lengths: np.ndarray, data: np.ndarray) -> bytes:
    return IC.encode_ints(lengths) + data.tobytes()


def _enc_zstd(lengths: np.ndarray, data: np.ndarray) -> bytes:
    comp = zstd_compress(data)
    return (
        IC.encode_ints(lengths)
        + struct.pack("<Q", data.size)
        + comp
    )


def _enc_fsst(lengths: np.ndarray, data: np.ndarray) -> bytes:
    return fsst.compress(data, _offsets(lengths))


def _enc_const(lengths: np.ndarray, data: np.ndarray) -> bytes:
    L = int(lengths[0])
    return struct.pack("<I", L) + data[:L].tobytes()


def _enc_dict(lengths: np.ndarray, data: np.ndarray) -> bytes:
    # pyarrow's dictionary_encode does the heavy lifting; build the Arrow
    # binary array zero-copy from (offsets, data) buffers.
    offs = _offsets(lengths)
    arr = pa.Array.from_buffers(
        pa.large_binary(), lengths.size,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data.tobytes())],
    )
    denc = arr.dictionary_encode()
    dvals = denc.dictionary
    idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dict_vals = dvals.to_pylist()
    dict_blob = b"".join(dict_vals)
    dlens = np.array([len(v) for v in dict_vals], dtype=np.int64)
    dbuf = np.frombuffer(dict_blob, dtype=np.uint8)
    sub_tag = select_bin_codec(dlens, dbuf)
    if sub_tag == T_BIN_DICT:  # no recursive dictionaries
        sub_tag = T_BIN_ZSTD
    dict_seg = encode_binary(dlens, dbuf, codec=sub_tag)
    idx_seg = IC.encode_ints(idx, exclude=frozenset({IC.T_DICT}))
    return struct.pack("<I", dlens.size) + dict_seg + idx_seg


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

_ENCODERS = {
    T_BIN_RAW: _enc_raw,
    T_BIN_ZSTD: _enc_zstd,
    T_BIN_DICT: _enc_dict,
    T_BIN_FSST: _enc_fsst,
    T_BIN_CONST: _enc_const,
}


def encode_binary(lengths: np.ndarray, data: np.ndarray,
                  codec: int | None = None) -> bytes:
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = lengths.size
    if n == 0:
        return _seg(T_BIN_RAW, b"")
    if codec is None:
        if int(lengths.sum()) + 8 * n < 4096:
            # Tiny column: exact trial of every candidate is ~free and
            # sampling-based estimates are least reliable here.
            cands = [T_BIN_RAW, T_BIN_ZSTD, T_BIN_DICT]
            segs = [
                _seg(c, _ENCODERS[c](lengths, data)) for c in cands
            ]
            return min(segs, key=len)
        codec = select_bin_codec(lengths, data)
    return _seg(codec, _ENCODERS[codec](lengths, data))


def decode_binary(buf, offset: int, count: int) -> tuple[np.ndarray, np.ndarray, int]:
    """-> (lengths int64, data uint8, next offset)."""
    mv = memoryview(buf)
    tag, plen = IC.HEADER.unpack_from(mv, offset)
    start = offset + IC.HEADER.size
    end = start + plen
    if end > len(mv):
        raise ValueError("bin segment: truncated payload")
    payload = mv[start:end]
    if count == 0:
        if plen:
            raise ValueError("bin segment: payload for zero values")
        return np.zeros(0, np.int64), np.zeros(0, np.uint8), end

    if tag == T_BIN_RAW:
        lengths, pos = IC.decode_ints(payload, 0, count)
        data = np.frombuffer(payload[pos:], dtype=np.uint8)
        if data.size != int(lengths.sum()):
            raise ValueError("bin_raw: data size mismatch")
        return lengths, data.copy(), end
    if tag == T_BIN_ZSTD:
        lengths, pos = IC.decode_ints(payload, 0, count)
        (raw_size,) = struct.unpack_from("<Q", payload, pos)
        pos += 8
        comp = payload[pos:]
        raw = zstd_decompress(comp, raw_size)
        data = np.frombuffer(raw, dtype=np.uint8)
        if data.size != int(lengths.sum()):
            raise ValueError("bin_zstd: data size mismatch")
        return lengths, data, end
    if tag == T_BIN_DICT:
        (card,) = struct.unpack_from("<I", payload, 0)
        dlens, dbuf, pos = decode_binary(payload, 4, card)
        idx, pos = IC.decode_ints(payload, pos, count)
        if pos != plen:
            raise ValueError("bin_dict: trailing payload bytes")
        if idx.size and (idx.min() < 0 or idx.max() >= dlens.size):
            raise ValueError("bin_dict: index out of range")
        doffs = _offsets(dlens)
        lengths = dlens[idx]
        out = np.empty(int(lengths.sum()), dtype=np.uint8)
        # Vectorized gather of variable-length slices: build flat source
        # positions via repeat + cumulative offsets.
        if out.size:
            starts = doffs[idx]
            out_offs = _offsets(lengths)
            # index arithmetic: for row i, copy dbuf[starts[i]:starts[i]+len]
            reps = np.repeat(starts - out_offs[:-1], lengths)
            flat = np.arange(out.size, dtype=np.int64) + reps
            out = dbuf[flat]
        return lengths, out, end
    if tag == T_BIN_FSST:
        data, lengths = fsst.decompress(payload, count)
        return lengths, data, end
    if tag == T_BIN_CONST:
        if len(payload) < 4:
            raise ValueError("bin_const: truncated header")
        (L,) = struct.unpack_from("<I", payload, 0)
        if len(payload) != 4 + L:
            # strict decode: a truncated value would otherwise return
            # lengths inconsistent with the data buffer (offsets past
            # the end downstream); trailing junk must refuse too
            raise ValueError("bin_const: payload size mismatch")
        val = np.frombuffer(payload[4 : 4 + L], dtype=np.uint8)
        lengths = np.full(count, L, dtype=np.int64)
        return lengths, np.tile(val, count), end
    raise ValueError(f"unknown binary codec tag 0x{tag:02x}")


# ---------------------------------------------------------------------------
# Selection — trial-based on a strided sample
# ---------------------------------------------------------------------------

def select_bin_codec(lengths: np.ndarray, data: np.ndarray) -> int:
    n = lengths.size
    if n == 0:
        return T_BIN_RAW
    total = int(lengths.sum())
    mean_len = total / n
    offs = _offsets(lengths)
    # Strided sample of whole values — sliced out via Arrow take (C
    # kernels) instead of a per-value Python loop; identical values, so
    # selection (and the encoded bytes) are unchanged.
    want = max(64, int(SAMPLE_BYTES / max(1.0, mean_len)))
    step = max(1, n // want)
    sidx = np.arange(0, n, step)
    arr = pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(np.ascontiguousarray(offs)),
         pa.py_buffer(np.ascontiguousarray(data))])
    sample_vals = arr.take(pa.array(sidx)).to_pylist()
    m = len(sample_vals)
    distinct = len(set(sample_vals))
    if distinct == 1 and step == 1:
        return T_BIN_CONST
    sample_blob = b"".join(sample_vals)
    sample_bytes = max(1, len(sample_blob))

    est: dict[int, float] = {}
    # lengths segment cost (shared by raw/zstd) — estimate via mean 1B/val.
    lens_cost = n * 0.5 + 26
    est[T_BIN_RAW] = total + lens_cost
    comp = zstd_compress(sample_blob)
    est[T_BIN_ZSTD] = len(comp) / sample_bytes * total + lens_cost + 16
    if distinct < 0.5 * m:
        card = distinct / m * n if distinct > 1 else distinct
        dict_bytes = distinct / m * total  # sample's share of distinct data
        idx_bits = max(1, int(np.ceil(np.log2(max(2.0, card)))))
        est[T_BIN_DICT] = (
            min(dict_bytes, total) * 0.7 + n * idx_bits / 8.0 + 64
        )
    # FSST trial costs a table build (~0.1 s); skip when zstd already
    # compresses the sample below what FSST ever reaches on short strings
    # (~3-6x), or when strings are long (zstd's home turf).
    zstd_ratio = est[T_BIN_ZSTD] / max(1.0, float(total))
    if mean_len <= FSST_MAX_MEAN_LEN and total >= 1024 and zstd_ratio > 0.22:
        table = fsst.build_table(sample_vals)
        slens = np.array([len(v) for v in sample_vals], dtype=np.int64)
        sdata = np.frombuffer(sample_blob, dtype=np.uint8)
        enc, _ = fsst.encode_column(sdata, _offsets(slens), table)
        ratio = enc.size / sample_bytes
        est[T_BIN_FSST] = ratio * total + len(table.serialize()) + n * 0.5 + 40
    return min(est, key=est.__getitem__)
