"""Distributed encode job: DataFrame -> .zseq blobs + manifest.

The Spark rebuild of the reference's write path (EP1 in SURVEY.md §3:
parse -> validate -> shred -> compress -> write, all single-threaded in
zbra). Here the plan is declarative up to the codec boundary:

  df -> repartition(P, doc_id)           [the only shuffle]
     -> mapInArrow(encode_partition)     [Arrow batches -> numpy codecs]
     -> executor writes part-{pid}.zseq  [tmp + rename, idempotent]
     -> metrics rows -> driver           [collect ~P small rows]
     -> manifest.json                    [atomic commit: tmp + rename]

Scale notes (design target: 10^12 sequences, 1000 executors):
  - One shuffle, hash-partitioned on doc_id: uniform row spread; a heavy
    doc (giant token array) is a single row so hashing is the best
    possible row-level balance — the per-partition token counts in the
    manifest make residual skew observable.
  - No driver-side data movement: the driver sees only P metric rows.
  - Idempotent tasks: output name is keyed by partition id; retried tasks
    overwrite via atomic rename. Resume anti-joins the manifest.
  - Row clustering: within a partition, rows are reordered by the bit
    width of their token arrays before encoding (order is free in a
    DataFrame; the correctness contract is keyed by doc_id). Mixed-width
    batches otherwise force every FORBP mini-block to the widest regime —
    measured ~2x size win on mixed-regime data.
"""

from __future__ import annotations

import json
import os
import time
import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .zseqfile import ZseqWriter

METRICS_SCHEMA = (
    "part_id int, file string, rows long, list_elems long, raw_bytes long, "
    "enc_bytes long, wall_sec double, codecs string, crc32 long"
)

_METRICS_PA = pa.schema([
    ("part_id", pa.int32()), ("file", pa.string()), ("rows", pa.int64()),
    ("list_elems", pa.int64()), ("raw_bytes", pa.int64()),
    ("enc_bytes", pa.int64()), ("wall_sec", pa.float64()),
    ("codecs", pa.string()), ("crc32", pa.int64()),
])


@dataclass
class EncodeResult:
    out_dir: str
    manifest: dict
    parts: list[dict]

    @property
    def total_rows(self) -> int:
        return sum(p["rows"] for p in self.parts)

    @property
    def total_list_elems(self) -> int:
        return sum(p["list_elems"] for p in self.parts)

    @property
    def total_enc_bytes(self) -> int:
        return sum(p["enc_bytes"] for p in self.parts)


def _cluster_order(tbl: pa.Table) -> np.ndarray | None:
    """Row order by (bit width of per-row max |value| of the first list
    column, list length). Returns None when there is nothing to cluster."""
    list_col = None
    for name in tbl.column_names:
        t = tbl.schema.field(name).type
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            if pa.types.is_integer(t.value_type):
                list_col = name
                break
    if list_col is None or tbl.num_rows < 2:
        return None
    arr = tbl.column(list_col).combine_chunks()
    import pyarrow.compute as pc

    lengths = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    flat = arr.flatten()
    vals = np.abs(flat.to_numpy(zero_copy_only=False).astype(np.int64))
    offs = np.zeros(lengths.size + 1, dtype=np.int64)
    np.cumsum(lengths, out=offs[1:])
    rowmax = np.zeros(lengths.size, dtype=np.int64)
    nz = lengths > 0
    if nz.any():
        rowmax[nz] = np.maximum.reduceat(vals, offs[:-1][nz])
    # bit width via frexp (exact for |v| < 2^53; clustering is heuristic
    # so clipping larger values is fine)
    width = np.frexp(np.clip(rowmax, 0, 1 << 52).astype(np.float64))[1]
    return np.lexsort((lengths, width))


def _encode_partition(out_dir: str, schema: pa.Schema, cluster: bool,
                      batch_rows: int, fs_prefix: str = ""):
    def fn(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        t0 = time.time()
        got = list(batches)
        if not got:
            return
        tbl = pa.Table.from_batches(got).combine_chunks()
        raw_bytes = tbl.nbytes
        if cluster:
            order = _cluster_order(tbl)
            if order is not None:
                tbl = tbl.take(order)
        fname = f"part-{pid:05d}.zseq"
        final = os.path.join(out_dir, fname)
        tmp = final + ".tmp"
        list_elems = 0
        for name in tbl.column_names:
            t = tbl.schema.field(name).type
            if pa.types.is_list(t) or pa.types.is_large_list(t):
                import pyarrow.compute as pc

                le = pc.sum(pc.list_value_length(tbl.column(name))).as_py()
                list_elems += int(le or 0)
        with open(tmp, "wb") as f:
            w = ZseqWriter(f, schema, {"part_id": pid})
            for b in tbl.to_batches(max_chunksize=batch_rows):
                w.write_batch(b)
            w.finish()
            f.flush()
            os.fsync(f.fileno())
        with open(tmp, "rb") as f:
            crc = zlib.crc32(f.read())
        os.replace(tmp, final)
        row = {
            "part_id": pid, "file": fname, "rows": tbl.num_rows,
            "list_elems": list_elems, "raw_bytes": raw_bytes,
            "enc_bytes": w.bytes_written, "wall_sec": time.time() - t0,
            "codecs": json.dumps(w.codec_stats), "crc32": crc,
        }
        yield pa.RecordBatch.from_pylist([row], schema=_METRICS_PA)

    return fn


def encode(df: DataFrame, out_dir: str, *, partitions: int | None = None,
           cluster: bool = True, batch_rows: int = 1 << 16,
           partition_col: str | None = None,
           resume: bool = False) -> EncodeResult:
    """Encode ``df`` into ``out_dir`` as .zseq blobs + manifest.json.

    ``partition_col``: hash-partition key (default: first column).
    ``resume``: skip partitions already committed in an existing manifest
    (requires the same ``partitions`` count — the hash assignment is
    deterministic, so surviving parts are reused verbatim).
    """
    spark = df.sparkSession
    from .session import ship_package

    ship_package(spark)  # executors must import zseq (--py-files pattern)
    P = partitions or spark.sparkContext.defaultParallelism
    key = partition_col or df.columns[0]
    os.makedirs(out_dir, exist_ok=True)

    done_parts: dict[int, dict] = {}
    if resume:
        prev = read_manifest(out_dir)
        if prev is not None:
            if prev["partitions"] != P:
                raise ValueError(
                    f"resume with partitions={P} but manifest has "
                    f"{prev['partitions']} — hash assignment would differ"
                )
            for p in prev.get("parts", []):
                path = os.path.join(out_dir, p["file"])
                if os.path.exists(path):
                    done_parts[p["part_id"]] = p

    arrow_schema = to_arrow_schema(df)
    work = df.repartition(P, F.col(key))
    parts: list[dict] = []
    todo = sorted(set(range(P)) - set(done_parts))
    if done_parts and todo:
        # Hash assignment is deterministic for fixed (key, P): after the
        # repartition, spark_partition_id IS the hash bucket — filter to
        # the buckets whose part files are missing.
        work = work.filter(F.spark_partition_id().isin(todo))
    if todo:
        fn = _encode_partition(out_dir, arrow_schema, cluster, batch_rows)
        metrics = work.mapInArrow(fn, METRICS_SCHEMA)
        parts = [r.asDict() for r in metrics.collect()]
    parts.extend(done_parts.values())
    parts.sort(key=lambda p: p["part_id"])

    manifest = {
        "format": "zseq/1",
        "partitions": P,
        "partition_col": key,
        "schema": arrow_schema.serialize().to_pybytes().hex(),
        "schema_names": arrow_schema.names,
        "parts": parts,
        "totals": {
            "rows": sum(p["rows"] for p in parts),
            "list_elems": sum(p["list_elems"] for p in parts),
            "raw_bytes": sum(p["raw_bytes"] for p in parts),
            "enc_bytes": sum(p["enc_bytes"] for p in parts),
        },
    }
    _atomic_write_json(os.path.join(out_dir, "manifest.json"), manifest)
    return EncodeResult(out_dir, manifest, parts)


def to_arrow_schema(df: DataFrame) -> pa.Schema:
    from pyspark.sql.pandas.types import to_arrow_schema as _tas

    return _tas(df.schema)


def read_manifest(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, "manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
