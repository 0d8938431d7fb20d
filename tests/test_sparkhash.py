"""zseq.sparkhash must be bit-for-bit Spark's hash() — fuzzed against
F.hash (the real Catalyst Murmur3) per type, then against the actual
bucket assignment repartition() performs, which is what file pruning
rides on."""

import datetime
import random

import pyarrow as pa
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zseq import sparkhash as SH


def _spark_hashes(spark, values, spark_type):
    df = spark.createDataFrame([(v,) for v in values],
                               T.StructType([T.StructField(
                                   "v", spark_type, True)]))
    rows = df.select(F.hash("v").alias("h"),
                     F.pmod(F.hash("v"), F.lit(8)).alias("b")).collect()
    return [(r.h, r.b) for r in rows]


INTS32 = [0, 1, -1, 2, 42, 2147483647, -2147483648, 123456789,
          -987654321, 7, 256, 65535, -65536]
LONGS = [0, 1, -1, 9223372036854775807, -9223372036854775808,
         4102444800000, 1 << 32, (1 << 32) - 1, -(1 << 32),
         123456789012345, -42]
STRINGS = ["", "a", "doc_00000450", "hello world", "é", "naïve",
           "é中文", "🚀🚀🚀", "abc" * 100, "\x00\x01",
           "tab\there", "ÿ" * 7]
BINS = [b"", b"\x00", b"\xff", b"\xff\xfe\xfd", b"\x80" * 5,
        bytes(range(256)), b"abc", b"\x7f\x80\x81"]


def test_hash_int_matches_spark(spark):
    got = _spark_hashes(spark, INTS32, T.IntegerType())
    for v, (h, b) in zip(INTS32, got):
        assert SH.hash_int(v) == h, v
        assert SH.hash_int(v) % 8 == b, v


def test_hash_long_matches_spark(spark):
    got = _spark_hashes(spark, LONGS, T.LongType())
    for v, (h, b) in zip(LONGS, got):
        assert SH.hash_long(v) == h, v
        assert SH.hash_long(v) % 8 == b, v


def test_hash_string_matches_spark(spark):
    got = _spark_hashes(spark, STRINGS, T.StringType())
    for v, (h, b) in zip(STRINGS, got):
        assert SH.hash_bytes(v.encode()) == h, repr(v)
        assert SH.hash_bytes(v.encode()) % 8 == b, repr(v)


def test_hash_binary_matches_spark(spark):
    got = _spark_hashes(spark, BINS, T.BinaryType())
    for v, (h, _) in zip(BINS, got):
        assert SH.hash_bytes(v) == h, repr(v)


def test_hash_fuzz_matches_spark(spark):
    rng = random.Random(0xC0FFEE)
    ints = [rng.randint(-(1 << 31), (1 << 31) - 1) for _ in range(200)]
    longs = [rng.randint(-(1 << 63), (1 << 63) - 1) for _ in range(200)]
    strs = ["".join(chr(rng.randint(1, 0x2FFF))
                    for _ in range(rng.randint(0, 23)))
            for _ in range(200)]
    for vals, st, fn in [
        (ints, T.IntegerType(), SH.hash_int),
        (longs, T.LongType(), SH.hash_long),
        (strs, T.StringType(), lambda s: SH.hash_bytes(s.encode())),
    ]:
        got = _spark_hashes(spark, vals, st)
        for v, (h, _) in zip(vals, got):
            assert fn(v) == h, repr(v)


def test_hash_temporal_matches_spark(spark):
    dates = [datetime.date(1970, 1, 1), datetime.date(2026, 8, 17),
             datetime.date(1969, 12, 31), datetime.date(2100, 1, 1)]
    got = _spark_hashes(spark, dates, T.DateType())
    for d, (h, _) in zip(dates, got):
        days = (d - datetime.date(1970, 1, 1)).days
        assert SH.hash_int(days) == h, d
        assert SH.bucket_of(days, pa.date32(), 8) == SH.hash_int(days) % 8
    tss = [datetime.datetime(2026, 8, 17, 12, 0, 0, 123456),
           datetime.datetime(1970, 1, 1), datetime.datetime(1955, 2, 3)]
    got = _spark_hashes(spark, tss, T.TimestampNTZType())
    for ts, (h, _) in zip(tss, got):
        us = (ts - datetime.datetime(1970, 1, 1)) \
            // datetime.timedelta(microseconds=1)
        assert SH.hash_long(us) == h, ts
        # storage s/ms/us all rescale to the micros Catalyst hashed
        assert SH.bucket_of(us, pa.timestamp("us"), 8) == h % 8
        if us % 1_000_000 == 0:
            assert SH.bucket_of(us // 1_000_000,
                                pa.timestamp("s"), 8) == h % 8


def test_bucket_matches_repartition_assignment(spark):
    """End proof: bucket_of == the partition id repartition(P, col)
    actually assigns, for a string and a long key."""
    P = 8
    ids = [f"doc_{i:05d}" for i in range(300)]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    rows = (df.repartition(P, F.col("doc_id"))
            .withColumn("pid", F.spark_partition_id()).collect())
    for r in rows:
        assert SH.bucket_of(r.doc_id, pa.string(), P) == r.pid, r.doc_id

    df2 = spark.createDataFrame([(i * 7919,) for i in range(300)],
                                "k bigint")
    rows2 = (df2.repartition(P, F.col("k"))
             .withColumn("pid", F.spark_partition_id()).collect())
    for r in rows2:
        assert SH.bucket_of(r.k, pa.int64(), P) == r.pid, r.k


def test_bucket_of_refusals():
    assert SH.bucket_of(True, pa.int32(), 8) is None
    assert SH.bucket_of(1.5, pa.float64(), 8) is None
    assert SH.bucket_of(3, pa.uint32(), 8) is None
    assert SH.bucket_of(1 << 40, pa.int32(), 8) is None
    assert SH.bucket_of("x", pa.int64(), 8) is None
    assert SH.bucket_of(5, pa.string(), 8) is None
    assert SH.bucket_of(5, pa.timestamp("ns"), 8) is None
    assert SH.bucket_of(5, pa.int64(), 0) is None


def test_buckets_for_predicate():
    t = pa.int64()
    b5 = SH.bucket_of(5, t, 8)
    b9 = SH.bucket_of(9, t, 8)
    assert SH.buckets_for_predicate([("k", "=", 5)], "k", t, 8) == {b5}
    assert SH.buckets_for_predicate([("k", "in", (5, 9))], "k", t, 8) \
        == {b5, b9}
    # intersection of conjuncts; other columns ignored
    assert SH.buckets_for_predicate(
        [("k", "=", 5), ("k", "in", (5, 9)), ("j", "=", 1)],
        "k", t, 8) == {b5}
    # range conjuncts / unhashable literals don't pin buckets
    assert SH.buckets_for_predicate([("k", ">=", 5)], "k", t, 8) is None
    assert SH.buckets_for_predicate([("k", "=", "x")], "k", t, 8) is None
    assert SH.buckets_for_predicate([], "k", t, 8) is None
