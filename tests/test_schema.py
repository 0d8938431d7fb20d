"""Schema/logical-layer operator tests, mirroring the reference's
schema-validation and boundary suites
(/root/reference/zbra-core/tests/schema-validation.rs:13-140,
boundary-validation.rs:8-34, roundtrip.rs merge properties :56-88)."""

import pytest
from pyspark.sql import types as T

from zseq import schema as S


def test_schema_self_validation():
    with pytest.raises(S.SchemaError, match="empty struct"):
        S.TableSchema([]).validate()
    with pytest.raises(S.SchemaError, match="duplicate"):
        S.TableSchema([
            S.Field("a", T.LongType()), S.Field("a", T.StringType()),
        ]).validate()
    with pytest.raises(S.SchemaError, match="empty struct"):
        S.TableSchema([
            S.Field("s", T.StructType([])),
        ]).validate()
    S.TOKENS_SCHEMA.validate()


def test_spark_roundtrip_of_schema():
    st = S.TOKENS_SCHEMA.to_spark()
    back = S.TableSchema.from_spark(st)
    assert [f.name for f in back.fields] == ["doc_id", "tokens", "n_tok",
                                             "source"]
    assert not back.fields[0].nullable


def test_validate_table_type_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", [1, 2], 2, "web"), ("b", [3], 1, "code")],
        S.TOKENS_SCHEMA.to_spark())
    S.validate_table(df, S.TOKENS_SCHEMA)
    wrong = df.withColumnRenamed("n_tok", "len")
    with pytest.raises(S.SchemaError, match="schema mismatch"):
        S.validate_table(wrong, S.TOKENS_SCHEMA)
    nullable_schema = S.TableSchema(
        [S.Field("x", T.LongType(), nullable=False)])
    df2 = spark.createDataFrame([(1,), (None,)], "x long")
    with pytest.raises(S.SchemaError, match="nulls in Deny"):
        S.validate_table(df2, nullable_schema)


def test_date_range_boundaries(spark):
    """Exactly at 0 / DATE_MAX_MS / +-1 (boundary-validation.rs:8-34)."""
    df = spark.createDataFrame(
        [(0,), (S.DATE_MAX_MS,), (-1,), (S.DATE_MAX_MS + 1,)], "ts long")
    row = S.validate_values(df, date_cols=["ts"]).collect()[0]
    assert row["ts_date_range_violations"] == 2


def test_merge_tables(spark):
    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(2, "y")], "k long, v string")
    assert S.merge_tables(a, b).count() == 2
    c = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(S.SchemaError, match="column sets differ"):
        S.merge_tables(a, c)


def test_merge_maps_keywise(spark):
    a = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    b = spark.createDataFrame([(2, 20), (3, 30)], "k long, v long")
    out = {r.k: r.v for r in S.merge_maps(a, b, "k").collect()}
    assert out == {1: 10, 2: 20, 3: 30}


def test_merge_maps_conflict_raises(spark):
    a = spark.createDataFrame([(1, 10)], "k long, v long")
    b = spark.createDataFrame([(1, 99)], "k long, v long")
    with pytest.raises(Exception, match="merge conflict"):
        S.merge_maps(a, b, "k").collect()
    assert S.merge_maps(a, b, "k", resolve="left").collect()[0].v == 10
    assert S.merge_maps(a, b, "k", resolve="right").collect()[0].v == 99


def test_fill_defaults(spark):
    df = spark.createDataFrame(
        [(None, None, None), (1, "x", 2.5)],
        "i long, s string, d double")
    out = S.fill_defaults(df).collect()
    row = sorted(out, key=lambda r: r.i)[0]
    assert (row.i, row.s, row.d) == (0, "", 0.0)


def test_take_typed(spark):
    df = spark.createDataFrame([(1, "x")], "i long, s string")
    S.take_typed(df, "i", T.LongType())
    with pytest.raises(S.SchemaError, match="expected"):
        S.take_typed(df, "i", T.StringType())


def test_merge_maps_double_epsilon(spark):
    """Doubles merge under the reference's f64::EPSILON tolerance
    (logical.rs:262-271); int conflicts stay strict."""
    a = spark.createDataFrame([(1, 0.1 + 0.2)], "k long, v double")
    b = spark.createDataFrame([(1, 0.3)], "k long, v double")
    # 0.1+0.2 != 0.3 bitwise but differs by ~5.5e-17 < f64::EPSILON
    out = S.merge_maps(a, b, "k").collect()
    assert len(out) == 1 and abs(out[0].v - 0.3) < 1e-12
    c = spark.createDataFrame([(1, 0.3 + 1e-9)], "k long, v double")
    import pytest as _pt
    with _pt.raises(Exception, match="merge conflict"):
        S.merge_maps(a, c, "k").collect()


def test_merge_maps_identical_inf_nan_not_conflict(spark):
    """Identical Inf (and NaN) doubles are equal under Spark comparison
    semantics and must merge without conflict (abs(Inf-Inf)=NaN would
    otherwise poison the epsilon test)."""
    a = spark.createDataFrame(
        [(1, float("inf")), (2, float("nan"))], "k long, v double")
    b = spark.createDataFrame(
        [(1, float("inf")), (2, float("nan"))], "k long, v double")
    out = S.merge_maps(a, b, "k").collect()
    assert len(out) == 2
    import math
    vals = {r.k: r.v for r in out}
    assert math.isinf(vals[1]) and math.isnan(vals[2])
    c = spark.createDataFrame([(1, float("-inf"))], "k long, v double")
    import pytest as _pt
    with _pt.raises(Exception, match="merge conflict"):
        S.merge_maps(a.filter("k = 1"), c, "k").collect()


def test_fill_defaults_binary_and_array(spark):
    """Binary defaults go through coalesce (DataFrame.fillna has no
    bytes case and would throw); arrays fill to []."""
    df = spark.createDataFrame(
        [(1, None, None), (2, b"xy", [3])],
        "i long, b binary, a array<int>")
    out = {r.i: r for r in S.fill_defaults(df).collect()}
    assert bytes(out[1].b) == b"" and out[1].a == []
    assert bytes(out[2].b) == b"xy" and out[2].a == [3]


def test_merge_maps_column_set_mismatch_raises(spark):
    """A column present on only one side must refuse (merge_tables
    contract) — silently dropping b-only data is not a merge."""
    a = spark.createDataFrame([(1, 10)], "k long, v long")
    b = spark.createDataFrame([(1, 10, 99)], "k long, v long, w long")
    with pytest.raises(S.SchemaError, match="column sets"):
        S.merge_maps(a, b, "k")
