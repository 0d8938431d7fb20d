"""Distributed decode job: .zseq blobs -> DataFrame.

The Spark rebuild of the reference's read path (EP2 in SURVEY.md §3:
header parse -> block read -> decompress -> unshred). Files are picked up
with Spark's binaryFile source (never splits a file, so one task decodes
one blob) and decoded inside ``mapInArrow`` back into Arrow batches of the
original schema — strict about magic, block framing, per-segment byte
consumption, and the trailing row count.
"""

from __future__ import annotations

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

from .encode import read_manifest
from .zseqfile import ZseqReader


def _decode_files(schema_names: list[str], crcs: dict[str, int] | None,
                  columns: list[str] | None = None,
                  predicate: list[tuple] | None = None):
    def fn(batches):
        import os

        from .zseqfile import check_crc

        for batch in batches:
            paths = batch.column("path").to_pylist()
            contents = batch.column("content").to_pylist()
            for path, content in zip(paths, contents):
                if crcs is not None:
                    check_crc(content, crcs.get(os.path.basename(path)),
                              path)
                r = ZseqReader(content)
                if list(r.schema.names) != list(schema_names):
                    raise ValueError(
                        f"{path}: schema {r.schema.names} != manifest "
                        f"{schema_names}"
                    )
                yield from r.batches(columns, predicate)

    return fn


def decode(spark: SparkSession, out_dir: str,
            allow_partial: bool = False,
            columns: list[str] | None = None,
            predicate: list[tuple] | None = None) -> DataFrame:
    """Read an encoded dataset back as a DataFrame.

    ``columns`` -> projection pushdown into the blob reader (unrequested
    columns are seeked past, never decompressed). ``predicate`` -> a
    conjunction of (col, op, int_value) pruned against per-block zone
    maps; surviving blocks may still hold non-matching rows, so compose
    with a normal ``.filter`` for exact semantics."""
    import os

    from .session import ship_package

    ship_package(spark)
    manifest = read_manifest(out_dir)
    if manifest is None and not allow_partial:
        raise FileNotFoundError(
            f"{out_dir}/manifest.json missing — encode did not commit "
            "(pass allow_partial=True to read surviving part files)"
        )
    schema = pa.ipc.read_schema(
        pa.py_buffer(bytes.fromhex(manifest["schema"]))
    ) if manifest else None

    if manifest is not None and columns is not None:
        missing = set(columns) - set(manifest["schema_names"])
        if missing:
            raise KeyError(f"zseq: unknown columns {sorted(missing)}")
    if manifest is not None:
        # Read EXACTLY the committed part list — never glob. Stray .zseq
        # files (orphans of a crashed overwrite/epoch commit, or a
        # concurrent writer's staged output) must not leak rows into a
        # committed dataset.
        paths = [os.path.join(out_dir, p["file"])
                 for p in manifest.get("parts", [])]
        if not paths:
            from pyspark.sql.pandas.types import from_arrow_schema

            empty_schema = schema if columns is None else pa.schema([
                schema.field(n) for n in schema.names
                if n in set(columns)])
            return spark.createDataFrame(
                [], from_arrow_schema(empty_schema))
        files = (
            spark.read.format("binaryFile").load(paths)
            .select("path", "content")
        )
    else:
        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.zseq")
            .load(out_dir)
            .select("path", "content")
        )
    if schema is None:
        # Partial read: schema from the first file.
        first = files.limit(1).collect()
        if not first:
            raise FileNotFoundError(f"no .zseq files in {out_dir}")
        schema = ZseqReader(first[0]["content"]).schema
        names = list(schema.names)
    else:
        names = manifest["schema_names"]

    from pyspark.sql.pandas.types import from_arrow_schema

    crcs = (
        {p["file"]: p["crc32"] for p in manifest.get("parts", [])}
        if manifest else None
    )
    if columns is not None:
        schema = pa.schema([
            schema.field(n) for n in schema.names if n in set(columns)
        ])
    spark_schema = from_arrow_schema(schema)
    return files.mapInArrow(
        _decode_files(names, crcs, columns, predicate), spark_schema)
