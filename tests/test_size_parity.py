"""Size-parity gate: zseq compressed bytes per column <= the reference
binary format's bytes on the same data (BASELINE.md acceptance metric),
checked against the pure-Python zbra size oracle (zseq/oracle.py,
byte-exact reimplementation of binary.rs:26-54 + compression.rs:286-290).
"""

import io

import numpy as np
import pyarrow as pa
import pytest

from zseq import oracle, synth, zseqfile
from zseq.codecs import primitives as P


def _zseq_column_sizes(tbl: pa.Table) -> dict[str, int]:
    from zseq import column as C

    return {
        name: len(C.encode_column(tbl.column(name).combine_chunks()))
        for name in tbl.column_names
    }


def test_oracle_matches_real_zbra_payload_bytes():
    """The oracle's int-pipeline arithmetic must equal the actual encoder's
    output length on varied data (it is the same code path, but guard the
    size-only fast path)."""
    rng = np.random.default_rng(7)
    for arr in [
        np.arange(1000, dtype=np.int64),
        rng.integers(-(2**62), 2**62, 513),
        np.zeros(64, dtype=np.int64),
        np.array([2**63 - 1, -(2**63)]),
    ]:
        assert oracle.int_array_compressed_size(arr) == 4 + 4 + len(
            P.zbra_compress_int_array(arr)
        )


def test_tokens_table_beats_reference_per_column():
    tbl = synth.tokens_table_arrow(4000)
    ours = _zseq_column_sizes(tbl)
    zbra = oracle.table_column_sizes(tbl)
    for col in tbl.column_names:
        assert ours[col] <= zbra[col], (
            f"column {col}: zseq {ours[col]} > zbra {zbra[col]}"
        )


def test_tokens_table_beats_reference_total():
    tbl = synth.tokens_table_arrow(4000)
    blob = zseqfile.encode_table(tbl)
    assert len(blob) <= oracle.table_size(tbl)


def test_timeseries_fixture_beats_reference():
    """FIXTURES.md F1 — the reference's production-data shape
    (tests/production-data.rs:19-107)."""
    i = np.arange(1000, dtype=np.int64)
    tbl = pa.table({
        "timestamp": pa.array(1640995200000 + i * 60000),
        "cpu_usage": pa.array(20.0 + (i * 0.1) % 80.0),
        "memory_usage": pa.array(512.0 + np.sin(i * 0.3) * 200.0),
        "disk_io": pa.array(np.where(i % 100 == 0, 1000.0, 10.0)),
    })
    ours = _zseq_column_sizes(tbl)
    zbra = oracle.table_column_sizes(tbl)
    for col in tbl.column_names:
        assert ours[col] <= zbra[col], (col, ours[col], zbra[col])


def test_iot_fixture_beats_reference():
    """FIXTURES.md F3 (tests/production-data.rs:579-685)."""
    i = np.arange(1000, dtype=np.int64)
    tbl = pa.table({
        "sensor_id": pa.array(i % 10),
        "timestamp": pa.array(1640995200000 + i * 1000),
        "temperature": pa.array(20.0 + (i % 10) * np.sin(i * 0.01)),
        "humidity": pa.array(50 + np.cos(i * 0.05) * 20),
        "battery_level": pa.array(100 - i // 100),
    })
    ours = _zseq_column_sizes(tbl)
    zbra = oracle.table_column_sizes(tbl)
    for col in tbl.column_names:
        assert ours[col] <= zbra[col], (col, ours[col], zbra[col])


@pytest.mark.parametrize("table", [
    "lineitem", "orders", "customer", "events", "documents",
    "embeddings", "supplier", "part", "nation", "region",
])
def test_real_testdata_beats_reference_per_column(table):
    """The ≤-reference gate on every column of every driver test table —
    not just the synthetic corpus."""
    import pyarrow.parquet as pq

    from zseq import column as C

    path = f"/root/testdata/sf0.001/{table}.parquet"
    import os

    if not os.path.exists(path):
        pytest.skip("testdata not present")
    tbl = pq.read_table(path)
    for name in tbl.column_names:
        ours = len(C.encode_column(tbl.column(name).combine_chunks()))
        zbra = oracle.column_size(tbl.column(name))
        assert ours <= zbra, (table, name, ours, zbra)


def test_e2e_compression_ratio_floor():
    """integration-validation.rs:291-295 asserts >1.5x on time-series; the
    rebuild must clear the same floor on its own format."""
    tbl = synth.tokens_table_arrow(4000)
    blob = zseqfile.encode_table(tbl)
    assert tbl.nbytes / len(blob) > 1.5


def test_enum_column_beats_reference():
    """K_ENUM bytes <= the reference's Enum layout (binary.rs:332-344:
    tag + default + compressed u32 tags + per-variant name/tag/column)
    on a representative mixed-variant column."""
    from zseq import column as C

    n = 4000
    codes = np.array([(i * 7) % 3 for i in range(n)], dtype=np.int8)
    codes = np.where(codes == 2, 5, codes).astype(np.int8)  # tags 0,1,5
    offs = np.zeros(n, np.int32)
    for c in (0, 1, 5):
        m = codes == c
        offs[m] = np.arange(m.sum(), dtype=np.int32)
    ints = pa.array(np.arange((codes == 0).sum(), dtype=np.int64) * 100)
    strs = pa.array([f"ev_{i % 17}" for i in range((codes == 1).sum())])
    dbls = pa.array(np.arange((codes == 5).sum()) * 0.25)
    u = pa.UnionArray.from_dense(
        pa.array(codes), pa.array(offs),
        [ints, strs, dbls], field_names=["i", "s", "d"],
        type_codes=[0, 1, 5])
    ours = len(C.encode_column(u))
    theirs = oracle.column_size(u)
    assert ours <= theirs, (ours, theirs)


def test_struct_map_decimal_columns_beat_reference():
    """The <=-reference gate extends to struct / map / decimal columns
    (previously the oracle had no dispatch for them at all)."""
    from decimal import Decimal

    n = 2000
    tbl = pa.table({
        "st": pa.array([{"a": i % 50, "b": f"v{i % 20}"}
                        for i in range(n)],
                       pa.struct([("a", pa.int64()), ("b", pa.string())])),
        "mp": pa.array([[(f"k{i % 5}", i)] for i in range(n)],
                       pa.map_(pa.string(), pa.int64())),
        "dec": pa.array([Decimal(i % 1000) / 100 for i in range(n)],
                        pa.decimal128(12, 2)),
        "dec38": pa.array([Decimal(i % 1000) * 10 ** 20 for i in range(n)],
                          pa.decimal128(38, 0)),
    })
    ours = _zseq_column_sizes(tbl)
    ref = oracle.table_column_sizes(tbl)
    for name in tbl.column_names:
        assert ours[name] <= ref[name], (name, ours[name], ref[name])
