"""Distributed decode job: .zseq blobs -> DataFrame.

The Spark rebuild of the reference's read path (EP2 in SURVEY.md §3:
header parse -> block read -> decompress -> unshred). Files are picked up
with Spark's binaryFile source (never splits a file, so one task decodes
one blob) and decoded inside ``mapInArrow`` back into Arrow batches of the
original schema — strict about magic, block framing, per-segment byte
consumption, and the trailing row count.
"""

from __future__ import annotations

import os

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

from .encode import read_manifest
from .zseqfile import ZseqReader


def spark_normalized(schema: pa.Schema) -> pa.Schema:
    """A schema as Spark's type system sees it (large_string -> string,
    etc.). Reader schemas always arrive through Spark types, so
    evolution comparisons happen in this normalized domain — otherwise a
    dataset written via the parquet fast path with e.g. large_string
    columns (never round-trippable through StructType) would refuse
    every Spark read. Falls back to the input when Spark cannot express
    a type at all (such a dataset is not Spark-readable anyway)."""
    try:
        from pyspark.sql.pandas.types import (from_arrow_schema,
                                              to_arrow_schema)

        return to_arrow_schema(from_arrow_schema(schema))
    except Exception:
        return schema


def evolution_fields(written: pa.Schema, reader: pa.Schema,
                     allow_subset: bool = False) -> list[pa.Field]:
    """Validate a reader schema against the written one for read-side
    schema evolution (the reference's serde-default evolution,
    docs/schema.md:299-459): the reader may ADD nullable columns (filled
    with L6 defaults on read) but may not change a written column's type
    or — unless ``allow_subset`` (the DataSource's projection path) —
    drop one (projection is ``columns=``, not a narrower schema).
    Returns the new fields in reader order."""
    new: list[pa.Field] = []
    written_names = set(written.names)
    written_lower = {n.lower() for n in written.names}
    seen_lower: set[str] = set()
    for f in reader:
        if f.name.lower() in seen_lower:
            raise ValueError(
                f"schema evolution: reader schema has duplicate column "
                f"{f.name!r} (case-insensitive) — Spark resolves names "
                "case-insensitively, so this is ambiguous")
        seen_lower.add(f.name.lower())
        if f.name in written_names:
            wt = written.field(f.name).type
            if not f.type.equals(wt):
                raise ValueError(
                    f"schema evolution: column {f.name!r} type "
                    f"{f.type} != written {wt} — type changes are not "
                    "supported (decode, then cast)")
        else:
            if f.name.lower() in written_lower:
                # Spark's default resolution is case-INsensitive: a
                # withColumn('N_tok', default) would silently REPLACE
                # the written n_tok data — refuse instead
                raise ValueError(
                    f"schema evolution: new column {f.name!r} differs "
                    "only in case from a written column — Spark would "
                    "resolve them to the same column and overwrite the "
                    "written data with the default")
            if not f.nullable:
                raise ValueError(
                    f"schema evolution: new column {f.name!r} must be "
                    "nullable — the written rows have no value for it "
                    "beyond the schema default")
            new.append(f)
    missing = written_names - set(reader.names)
    if missing and not allow_subset:
        raise ValueError(
            f"schema evolution: reader schema drops written column(s) "
            f"{sorted(missing)} — narrowing is not evolution; project "
            "with columns=[...] instead")
    return new


def _arrow_default(t: pa.DataType):
    """L6 default_for (zseq/schema.py:218) in the Arrow type domain:
    ints 0, floats 0.0, string '', binary b'', bool false, list [] —
    None (null) for types with no zero-value (struct/map/decimal/
    temporal, matching default_for exactly)."""
    if pa.types.is_integer(t):
        return 0
    if pa.types.is_floating(t):
        return 0.0
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ""
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return b""
    if pa.types.is_boolean(t):
        return False
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return []
    return None


def default_array(t: pa.DataType, n: int) -> pa.Array:
    """n copies of the L6 default as an Arrow array."""
    d = _arrow_default(t)
    if d is None:
        return pa.nulls(n, t)
    return pa.repeat(pa.scalar(d, type=t), n)


def evolve_batch(batch: pa.RecordBatch,
                 reader_schema: pa.Schema) -> pa.RecordBatch:
    """Reorder a decoded batch to the reader schema, synthesizing the
    new columns as L6-default constants."""
    present = {name: batch.column(i)
               for i, name in enumerate(batch.schema.names)}

    def col(f: pa.Field):
        if f.name not in present:
            return default_array(f.type, batch.num_rows)
        a = present[f.name]
        # written types that Spark normalizes (large_string -> string)
        # must match the declared reader schema exactly
        return a if a.type.equals(f.type) else a.cast(f.type)

    return pa.RecordBatch.from_arrays([col(f) for f in reader_schema],
                                      schema=reader_schema)


def _crc_keys(path: str) -> tuple[str, ...]:
    """Manifest-crc lookup keys: the last two path components
    ("<dataset-or-epoch-dir>/<part file>"). Basename alone is ambiguous
    for streaming layouts, where every epoch names its parts
    part-00000.zseq...; the parent dir disambiguates. Spark's binaryFile
    source hands back a Hadoop URI, which percent-encodes characters the
    manifest (raw filesystem names) never would — so the url-DECODED key
    is tried as well (raw first, covering a filename with a literal
    '%'); the refuse-on-miss behavior is unchanged."""
    from urllib.parse import unquote

    raw = "/".join(path.rstrip("/").split("/")[-2:])
    dec = "/".join(unquote(path).rstrip("/").split("/")[-2:])
    return (raw,) if raw == dec else (raw, dec)


def _decode_files(schema_names: list[str], crcs: dict[str, int] | None,
                  columns: list[str] | None = None,
                  predicate: list[tuple] | None = None):
    def fn(batches):
        from .session import quiet_worker_zip_finders
        from .zseqfile import check_crc

        quiet_worker_zip_finders()

        for batch in batches:
            # one blob at a time: to_pylist would copy EVERY file's bytes
            # in the batch into Python objects simultaneously, doubling
            # peak memory across all of them
            pcol, ccol = batch.column("path"), batch.column("content")
            for i in range(batch.num_rows):
                path = pcol[i].as_py()
                # zero-copy view of the blob (as_py would copy the whole
                # file into a Python bytes object)
                content = memoryview(ccol[i].as_buffer())
                if crcs is not None:
                    want = next((crcs[k] for k in _crc_keys(path)
                                 if k in crcs), None)
                    if want is None:
                        raise ValueError(
                            f"{path}: no crc32 entry in manifest for key "
                            f"{_crc_keys(path)!r} — refusing unverified "
                            "read")
                    check_crc(content, want, path)
                r = ZseqReader(content)
                if list(r.schema.names) != list(schema_names):
                    raise ValueError(
                        f"{path}: schema {r.schema.names} != manifest "
                        f"{schema_names}"
                    )
                yield from r.batches(columns, predicate)

    return fn


def _df_from_parts(spark: SparkSession, paths: list[str],
                   crcs: dict[str, int] | None, schema: pa.Schema,
                   names: list[str],
                   columns: list[str] | None = None,
                   predicate: list[tuple] | None = None) -> DataFrame:
    """ONE binaryFile scan over ``paths`` + one mapInArrow decode — the
    shared tail of every decode entry point (batch dataset, stream epochs,
    partial reads). The plan has a single scan node regardless of how many
    directories the paths span."""
    from pyspark.sql.pandas.types import from_arrow_schema

    if columns is not None:
        schema = pa.schema([
            schema.field(n) for n in schema.names if n in set(columns)
        ])
    if not paths:
        return spark.createDataFrame([], from_arrow_schema(schema))
    files = (
        spark.read.format("binaryFile").load(paths)
        .select("path", "content")
    )
    return files.mapInArrow(
        _decode_files(names, crcs, columns, predicate),
        from_arrow_schema(schema))


def decode(spark: SparkSession, out_dir: str,
            allow_partial: bool = False,
            columns: list[str] | None = None,
            predicate: list[tuple] | None = None,
            schema=None, revision: int | None = None) -> DataFrame:
    """Read an encoded dataset back as a DataFrame.

    ``columns`` -> projection pushdown into the blob reader (unrequested
    columns are seeked past, never decompressed). ``predicate`` -> a
    conjunction of (col, op, value) pruned against per-block zone
    maps (int storage values for int-kind columns, str/bytes for binary
    columns); surviving blocks may still hold non-matching rows, so
    compose with a normal ``.filter`` for exact semantics.

    ``schema`` -> read-side schema EVOLUTION (pyarrow.Schema or Spark
    StructType): a superset of the written schema whose new nullable
    columns are filled with L6 defaults (ints 0, strings '', arrays [],
    null for types without a zero-value) — the reference's serde-default
    evolution (docs/schema.md:299-459) for long-lived datasets that grew
    columns. Type changes and dropped columns are refused (project with
    ``columns``; cast after decode). The fill is a constant JVM-side
    projection — zero decode cost, zero Python.

    ``revision`` -> TIME TRAVEL: read the dataset as of that manifest
    revision (``zseq.revisions(out_dir)`` lists retained ones). Append
    and compaction retain superseded snapshots — reading revision N-1
    after an append returns exactly the pre-append rows; vacuum()
    expires aged snapshots and an overwrite resets history."""
    from .session import ship_package

    ship_package(spark)
    if schema is not None:
        return _decode_evolved(spark, out_dir, schema, allow_partial,
                               columns, predicate, revision)
    manifest = read_manifest(out_dir, revision=revision)
    if manifest is None and not allow_partial:
        raise FileNotFoundError(
            f"{out_dir}/manifest.json missing — encode did not commit "
            "(pass allow_partial=True to read surviving part files)"
        )
    if manifest is None:
        # Partial read: glob survivors, schema from the first file.
        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.zseq")
            .load(out_dir)
            .select("path", "content")
        )
        first = files.limit(1).collect()
        if not first:
            raise FileNotFoundError(f"no .zseq files in {out_dir}")
        schema = ZseqReader(first[0]["content"]).schema
        names = list(schema.names)
        if columns is not None:
            missing = set(columns) - set(names)
            if missing:  # same driver-side error the committed path gives
                raise KeyError(f"zseq: unknown columns {sorted(missing)}")
        from pyspark.sql.pandas.types import from_arrow_schema

        out_schema = schema if columns is None else pa.schema([
            schema.field(n) for n in schema.names if n in set(columns)])
        return files.mapInArrow(
            _decode_files(names, None, columns, predicate),
            from_arrow_schema(out_schema))

    schema = pa.ipc.read_schema(
        pa.py_buffer(bytes.fromhex(manifest["schema"])))
    names = manifest["schema_names"]
    if columns is not None:
        missing = set(columns) - set(names)
        if missing:
            raise KeyError(f"zseq: unknown columns {sorted(missing)}")
    # Read EXACTLY the committed part list — never glob. Stray .zseq
    # files (orphans of a crashed overwrite/epoch commit, or a
    # concurrent writer's staged output) must not leak rows into a
    # committed dataset.
    base = os.path.basename(os.path.abspath(out_dir))
    parts = manifest.get("parts", [])
    if predicate:
        # driver-side FILE pruning: zone envelopes + hash-bucket pinning
        # (zseqfile.prune_parts). At cluster scale, skipping a file here
        # saves the whole task launch + blob fetch, not just its decode
        # work; a point lookup on a hash-mode dataset's key opens ONE of
        # P files. Conservative superset (like block pruning) — Spark's
        # own filter above handles exact row semantics.
        from .zseqfile import prune_parts

        pcol = manifest.get("partition_col")
        parts = prune_parts(
            parts, predicate, mode=manifest.get("mode"),
            partition_col=pcol,
            partitions=manifest.get("partitions"),
            key_type=(schema.field(pcol).type
                      if pcol in set(names) else None))
    paths = [os.path.join(out_dir, p["file"]) for p in parts]
    crcs = {f"{base}/{p['file']}": p["crc32"] for p in parts}
    return _df_from_parts(spark, paths, crcs, schema, names,
                          columns, predicate)


def _decode_evolved(spark: SparkSession, out_dir: str, schema,
                    allow_partial: bool, columns: list[str] | None,
                    predicate: list[tuple] | None,
                    revision: int | None = None) -> DataFrame:
    """decode() with a reader schema: decode the written columns as
    usual, then project to the reader schema with constant L6 defaults
    for the new columns — all inside one JVM-side select (Catalyst
    folds the literals; nothing extra crosses the Python boundary)."""
    manifest = read_manifest(out_dir, revision=revision)
    if manifest is None:
        raise FileNotFoundError(
            f"{out_dir}/manifest.json missing — schema evolution needs "
            "the committed schema to validate against"
            + (" (allow_partial reads cannot evolve)"
               if allow_partial else ""))
    reader_struct, read_cols, new_names, _written = evolved_read_plan(
        schema, manifest["schema"], columns)
    base = decode(spark, out_dir, columns=read_cols, predicate=predicate,
                  revision=revision)
    return apply_evolution(base, reader_struct, new_names, columns)


def evolved_read_plan(schema, written_hex: str,
                      columns: list[str] | None):
    """Shared validation half of an evolved read (batch decode AND
    decode_stream): the reader schema (pyarrow.Schema or Spark
    StructType) against the committed hex-serialized Arrow schema ->
    (reader_struct, read_cols, new_names, written). ``read_cols`` is the
    projection to actually read from disk (None = all written columns);
    when every requested column is new, ONE written column is still read
    so the row count is real (apply_evolution drops it). ``written`` is
    the parsed, Spark-normalized committed schema so callers don't
    re-parse the hex."""
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import (from_arrow_schema,
                                          to_arrow_schema)

    if isinstance(schema, T.StructType):
        reader_arrow = to_arrow_schema(schema)
        reader_struct = schema
    elif isinstance(schema, pa.Schema):
        reader_arrow = schema
        reader_struct = from_arrow_schema(schema)
    else:
        raise TypeError(
            f"decode schema must be a pyarrow.Schema or Spark "
            f"StructType, got {type(schema).__name__}")
    written = spark_normalized(pa.ipc.read_schema(
        pa.py_buffer(bytes.fromhex(written_hex))))
    new_fields = evolution_fields(written, spark_normalized(reader_arrow))
    new_names = {f.name for f in new_fields}
    if columns is not None:
        missing = set(columns) - set(reader_arrow.names)
        if missing:
            raise KeyError(f"zseq: unknown columns {sorted(missing)}")
    read_cols = None
    if columns is not None:
        read_cols = [c for c in columns if c not in new_names]
        if not read_cols:
            read_cols = [written.names[0]]
    return reader_struct, read_cols, new_names, written


def apply_evolution(base, reader_struct, new_names: set,
                    columns: list[str] | None):
    """Projection half of an evolved read: constant L6 defaults for the
    new columns, reader-order select — one JVM-side projection (Catalyst
    folds the literals; nothing extra crosses the Python boundary)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from .schema import default_for

    out = base
    for f in reader_struct.fields:
        if f.name not in new_names:
            continue
        if columns is not None and f.name not in set(columns):
            continue
        d = default_for(f.dataType)
        if isinstance(f.dataType, T.ArrayType):
            col = F.array().cast(f.dataType)
        elif d is None:
            col = F.lit(None).cast(f.dataType)
        else:
            col = F.lit(d).cast(f.dataType)
        out = out.withColumn(f.name, col)
    order = [f.name for f in reader_struct.fields] if columns is None \
        else list(columns)
    return out.select(order)
