"""FSST correctness (roundtrip incl. escape-heavy inputs) and ratio floors."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zseq.codecs import fsst


def _col(strs):
    data = np.frombuffer(b"".join(strs), dtype=np.uint8)
    lens = np.array([len(s) for s in strs], dtype=np.int64)
    offs = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    return data, offs


def _roundtrip(strs):
    data, offs = _col(strs)
    blob = fsst.compress(data, offs)
    d2, lens2 = fsst.decompress(memoryview(blob), len(strs))
    offs2 = np.zeros(len(strs) + 1, np.int64)
    np.cumsum(lens2, out=offs2[1:])
    out = [d2[offs2[i]:offs2[i + 1]].tobytes() for i in range(len(strs))]
    return out, len(blob)


CASES = {
    "doc_ids": [f"doc_{i:08d}".encode() for i in range(2000)],
    "categorical": [b"web", b"books", b"code"] * 1000,
    "escape_heavy": [bytes([255]) * 7, b"\xffa\xff", b"x\xff", b"\xff"],
    "empty_strings": [b"", b"abc", b"", b""],
    "all_empty": [b"", b""],
    "none": [],
    "binary_garbage": [bytes(range(256)), bytes(reversed(range(256)))],
}


@pytest.mark.parametrize("name", CASES)
def test_roundtrip(name):
    strs = CASES[name]
    out, _ = _roundtrip(strs)
    assert out == strs


@settings(max_examples=150, deadline=None)
@given(st.lists(st.binary(max_size=40), max_size=60))
def test_roundtrip_property(strs):
    out, _ = _roundtrip(strs)
    assert out == strs


def test_ratio_on_structured_ids():
    strs = [f"doc_{i:08d}".encode() for i in range(20000)]
    out, sz = _roundtrip(strs)
    raw = sum(len(s) for s in strs)
    assert out == strs
    assert raw / sz > 2.0, f"fsst ratio {raw / sz:.2f} too weak on ids"


def test_symbol_table_roundtrip():
    t = fsst.build_table([b"hello world", b"hello there", b"well hello"])
    blob = t.serialize()
    t2, pos = fsst.SymbolTable.deserialize(memoryview(blob))
    assert pos == len(blob)
    assert t2.symbols == t.symbols
