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
        from .zseqfile import check_crc

        for batch in batches:
            # one blob at a time: to_pylist would copy EVERY file's bytes
            # in the batch into Python objects simultaneously, doubling
            # peak memory across all of them
            pcol, ccol = batch.column("path"), batch.column("content")
            for i in range(batch.num_rows):
                path, content = pcol[i].as_py(), ccol[i].as_py()
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
            predicate: list[tuple] | None = None) -> DataFrame:
    """Read an encoded dataset back as a DataFrame.

    ``columns`` -> projection pushdown into the blob reader (unrequested
    columns are seeked past, never decompressed). ``predicate`` -> a
    conjunction of (col, op, value) pruned against per-block zone
    maps (int storage values for int-kind columns, str/bytes for binary
    columns); surviving blocks may still hold non-matching rows, so
    compose with a normal ``.filter`` for exact semantics."""
    from .session import ship_package

    ship_package(spark)
    manifest = read_manifest(out_dir)
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
    paths = [os.path.join(out_dir, p["file"])
             for p in manifest.get("parts", [])]
    crcs = {f"{base}/{p['file']}": p["crc32"]
            for p in manifest.get("parts", [])}
    return _df_from_parts(spark, paths, crcs, schema, names,
                          columns, predicate)
