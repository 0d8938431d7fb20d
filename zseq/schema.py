"""Schema & logical-layer operators — the rebuild of zbra's logical layer
(/root/reference/zbra-core/src/logical.rs).

zbra's schema algebra maps onto Spark types (SURVEY.md §1.5); what must be
rebuilt is the *behavior*: schema self-validation (L3), value-vs-schema
validation incl. the compression-driven Date range (L2), table merge (L4),
defaults (L6), and checked extractors (L7). The relational machinery is
Spark's own.

Each operator exists twice: a driver-side pure function over schema
objects, and a DataFrame-level operator for data-dependent checks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The reference's compression-driven Date limit: Jan 1 2100 in epoch ms.
# Dates beyond this make FOR deltas exceed 32 bits and fall off the BP64
# efficiency cliff (logical.rs:159-176, docs/compression-pipeline.md:94-151).
DATE_MAX_MS = 4102444800000


class SchemaError(ValueError):
    pass


@dataclass
class Field:
    name: str
    dtype: T.DataType
    nullable: bool = True  # zbra Default::Allow (Deny == non-null)


@dataclass
class TableSchema:
    """Array-of-struct table schema (the standard zbra shape,
    TableSchema::Array{element: Struct}, logical.rs:8-23)."""

    fields: list[Field] = field(default_factory=list)

    # -- L3: schema self-validation (logical.rs:396-459) -------------------
    def validate(self) -> "TableSchema":
        if not self.fields:
            raise SchemaError("empty struct: a table needs >=1 field")
        names = [f.name for f in self.fields]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise SchemaError(f"duplicate field names: {sorted(dupes)}")
        for f in self.fields:
            _validate_dtype(f.name, f.dtype)
        return self

    def to_spark(self) -> T.StructType:
        return T.StructType([
            T.StructField(f.name, f.dtype, f.nullable) for f in self.fields
        ])

    @classmethod
    def from_spark(cls, st: T.StructType) -> "TableSchema":
        return cls([Field(f.name, f.dataType, f.nullable) for f in st.fields])


_ALLOWED = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType,
    T.DoubleType, T.StringType, T.BinaryType, T.BooleanType,
    T.DateType, T.TimestampType, T.TimestampNTZType,
)


def _validate_dtype(name: str, dt: T.DataType) -> None:
    if isinstance(dt, T.ArrayType):
        _validate_dtype(name + ".element", dt.elementType)
        return
    if isinstance(dt, T.StructType):
        if not dt.fields:
            raise SchemaError(f"{name}: empty struct")
        inner = [f.name for f in dt.fields]
        if len(set(inner)) != len(inner):
            raise SchemaError(f"{name}: duplicate nested field names")
        for f in dt.fields:
            _validate_dtype(f"{name}.{f.name}", f.dataType)
        return
    if isinstance(dt, T.MapType):
        _validate_dtype(name + ".key", dt.keyType)
        _validate_dtype(name + ".value", dt.valueType)
        return
    if not isinstance(dt, _ALLOWED):
        raise SchemaError(f"{name}: unsupported type {dt.simpleString()}")


# -- L1: table-vs-schema validation (logical.rs:78-99) ----------------------

def validate_table(df: DataFrame, schema: TableSchema) -> None:
    """Structural check: same field names/types; Deny (non-null) fields
    must actually contain no nulls (checked lazily via an assertion
    column, not a collect of the data)."""
    schema.validate()
    want = {(f.name, f.dtype.simpleString()) for f in schema.fields}
    got = {(f.name, f.dataType.simpleString()) for f in df.schema.fields}
    if want != got:
        raise SchemaError(
            f"schema mismatch:\n  want {sorted(want)}\n  got  {sorted(got)}"
        )
    deny = [f.name for f in schema.fields if not f.nullable]
    if deny:
        counts = df.select([
            F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in deny
        ]).collect()[0]
        bad = {c: counts[c] for c in deny if counts[c]}
        if bad:
            raise SchemaError(f"nulls in Deny (non-null) fields: {bad}")


# -- L2: value validation (logical.rs:153-245) -------------------------------

def validate_values(df: DataFrame,
                    date_cols: list[str] | None = None) -> DataFrame:
    """Returns a one-row DataFrame of violation counts. Spark strings are
    UTF-8 by construction (the reference's UTF-8 check is a no-op here);
    the Date range check is the compression-driven invariant that must be
    preserved (logical.rs:159-176)."""
    checks = []
    for c in date_cols or []:
        dt = dict(df.dtypes)[c]
        ms = (
            f"unix_millis(cast({c} as timestamp))"
            if "timestamp" in dt or dt == "date"
            else f"cast({c} as bigint)"
        )
        checks.append(
            F.expr(
                f"count(case when not (({ms}) between 0 and {DATE_MAX_MS}) "
                f"then 1 end)"
            ).alias(f"{c}_date_range_violations")
        )
    if not checks:
        checks = [F.count(F.lit(1)).alias("rows")]
    return df.agg(*checks)


# -- L4: merge (logical.rs:102-138) ------------------------------------------

def merge_tables(a: DataFrame, b: DataFrame) -> DataFrame:
    """Array (+) Array = concatenation; schema must match by name."""
    if set(a.columns) != set(b.columns):
        raise SchemaError(
            f"merge: column sets differ: {sorted(a.columns)} vs "
            f"{sorted(b.columns)}"
        )
    return a.unionByName(b)


def merge_maps(a: DataFrame, b: DataFrame, key: str,
               resolve: str = "error") -> DataFrame:
    """Map (+) Map = key-wise merge (logical.rs:112-131). ``resolve``:
    'error' raises on conflicting values for the same key (the reference's
    primitive-merge semantics: values must be equal, logical.rs:248-271);
    'left'/'right' pick a side.

    DOCUMENTED DIVERGENCE from the reference: identical NaN/Inf doubles
    merge cleanly here, whereas the reference's epsilon test
    (logical.rs:262-271, abs(NaN) < eps == false) errors even on a value
    merged with itself. Self-merge succeeding is the deliberate choice —
    a distributed engine re-merges the same shard after retries, and a
    NaN column must not poison an idempotent replay. Parity audits: this
    is the one L5 behavior that intentionally differs."""
    if set(a.columns) != set(b.columns):
        # same contract merge_tables enforces — a column present on one
        # side only would otherwise be SILENTLY dropped from the merge
        raise SchemaError(
            f"merge_maps: column sets differ: {sorted(a.columns)} vs "
            f"{sorted(b.columns)}")
    value_cols = [c for c in a.columns if c != key]
    bj = b.select(key, *[F.col(c).alias(f"__b_{c}") for c in value_cols])
    joined = a.join(bj, on=key, how="full_outer")
    # Doubles merge under the reference's epsilon tolerance
    # (logical.rs:262-271: (a - b).abs() < f64::EPSILON); every other
    # primitive must be exactly equal.
    f64_eps = 2.220446049250313e-16
    double_cols = {
        f.name for f in a.schema.fields
        if isinstance(f.dataType, (T.FloatType, T.DoubleType))
    }
    out = [F.col(key)]
    for c in value_cols:
        l, r = F.col(c), F.col(f"__b_{c}")
        if resolve == "error":
            if c in double_cols:
                # (l != r) is false for identical Inf/NaN under Spark's
                # comparison semantics; the epsilon test alone would
                # NaN-poison them into spurious conflicts (abs(Inf-Inf)
                # is NaN and NaN orders above every number).
                differs = (l != r) & ~(F.abs(l - r) < f64_eps)
            else:
                differs = l != r
            conflict = l.isNotNull() & r.isNotNull() & differs
            merged = F.when(
                conflict,
                F.raise_error(F.concat(
                    F.lit(f"merge conflict on {c} for key="),
                    F.col(key).cast("string")))
            ).otherwise(F.coalesce(l, r))
        elif resolve == "left":
            merged = F.coalesce(l, r)
        else:
            merged = F.coalesce(r, l)
        out.append(merged.alias(c))
    return joined.select(*out)


# -- L6: defaults (logical.rs:355-391) ----------------------------------------

def default_for(dt: T.DataType):
    """Zero-value per schema node: Int->0, Double->0.0, Binary->empty,
    Bool->false, Array->[] (the reference's default_for_schema)."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return 0
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return 0.0
    if isinstance(dt, T.StringType):
        return ""
    if isinstance(dt, T.BinaryType):
        return b""
    if isinstance(dt, T.BooleanType):
        return False
    if isinstance(dt, T.ArrayType):
        return []
    return None


def fill_defaults(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Replace nulls by schema defaults (Allow semantics materialized)."""
    out = df
    for f in df.schema.fields:
        if cols is not None and f.name not in cols:
            continue
        d = default_for(f.dataType)
        if d is None:
            continue
        if isinstance(f.dataType, T.ArrayType):
            out = out.withColumn(
                f.name,
                F.coalesce(F.col(f.name),
                           F.array().cast(f.dataType.simpleString())))
        elif isinstance(f.dataType, T.BinaryType):
            # DataFrame.fillna's JVM value match has no bytes case —
            # coalesce with an empty-binary literal instead
            out = out.withColumn(
                f.name, F.coalesce(F.col(f.name), F.lit(b"")))
        else:
            out = out.fillna({f.name: d})
    return out


# -- L7: typed extractors (logical.rs:464-546) --------------------------------

def take_typed(df: DataFrame, col: str, expect: T.DataType):
    """Checked column access: raises unless the column has the expected
    type (no silent casts — the reference's take_* semantics)."""
    actual = df.schema[col].dataType
    if actual.simpleString() != expect.simpleString():
        raise SchemaError(
            f"take: column {col} is {actual.simpleString()}, "
            f"expected {expect.simpleString()}"
        )
    return df[col]


# The tokens-table schema (BASELINE.json input_hint), Deny on every field.
TOKENS_SCHEMA = TableSchema([
    Field("doc_id", T.StringType(), nullable=False),
    Field("tokens", T.ArrayType(T.IntegerType(), False), nullable=False),
    Field("n_tok", T.IntegerType(), nullable=False),
    Field("source", T.StringType(), nullable=False),
])
