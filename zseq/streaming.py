"""Structured Streaming ingest: a stream of rows -> .zseq epochs.

The reference's "streaming" is chunked file I/O in its benches
(/root/reference/zbra-core/benches/streaming-io.rs:8-51 — 1000-row chunks,
single process). The Spark-native rebuild is real streaming: any
``readStream`` source feeds ``foreachBatch``, each micro-batch is encoded
into its own epoch directory with the standard atomic manifest, and epoch
replay (Spark's at-least-once foreachBatch contract) is made exactly-once
by the manifest commit: a replayed epoch that already committed is a no-op.

    out_dir/
      epoch-00000000/ part-*.zseq + manifest.json
      epoch-00000001/ ...

``decode_stream`` reads the union of committed epochs — uncommitted
(crashed mid-epoch) directories are invisible, preserving the
encode-side atomicity across the streaming boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import encode as zenc
from . import zseqfile


def epoch_dir(out_dir: str, epoch_id: int) -> str:
    return os.path.join(out_dir, f"epoch-{epoch_id:08d}")


def committed_epochs(out_dir: str) -> list[str]:
    if not os.path.isdir(out_dir):
        return []
    out = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if name.startswith("epoch-") and \
                os.path.exists(os.path.join(d, "manifest.json")):
            out.append(d)
    return out


def encode_stream(stream_df: DataFrame, out_dir: str, checkpoint: str,
                  partitions: int | None = None, cluster: bool = True,
                  available_now: bool = True):
    """Start the streaming encode. Returns the StreamingQuery.

    ``available_now=True`` drains everything currently available and
    stops (the batch-ingest pattern); pass False for a continuous query.
    """
    os.makedirs(out_dir, exist_ok=True)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        dest = epoch_dir(out_dir, epoch_id)
        if os.path.exists(os.path.join(dest, "manifest.json")):
            return  # replayed epoch — already committed, exactly-once
        zenc.encode(batch_df, dest, mode="hash",
                    partitions=partitions
                    or batch_df.sparkSession.sparkContext.defaultParallelism,
                    cluster=cluster)

    writer = (
        stream_df.writeStream
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup(stream_df: DataFrame, col: str = "text",
                 key: str = "doc_id") -> DataFrame:
    """Cross-batch streaming exact dedup: emit each distinct (normalized)
    text exactly once over the stream's lifetime — the first row seen for
    its fingerprint (min ``key`` within a batch for determinism).

    This is the custom-stateful-operator pattern
    (``applyInPandasWithState``): state is keyed on the md5 fingerprint
    and holds a single 'seen' flag, so state size is one tiny row per
    distinct document ever seen — the minimum any exactly-once dedup can
    hold — and it shuffles once on the fingerprint, the same key the
    batch ``exact_groups`` uses. Replays are idempotent because state
    lives in the checkpoint."""
    import pandas as pd

    from .textops import fingerprint_exprs

    fp_s, _ = fingerprint_exprs(col)
    cols = stream_df.columns
    with_fp = stream_df.selectExpr(*cols, f"{fp_s} as fingerprint")
    out_type = with_fp.schema

    def fn(key_tuple, pdfs, state):
        if state.exists:
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        state.update((True,))
        first = batch.sort_values(key).head(1)
        yield first

    return (
        with_fp.groupBy("fingerprint")
        .applyInPandasWithState(
            fn, out_type, "seen boolean", "update",
            "NoTimeout")
    )


def windowed_stats(stream_df: DataFrame, time_col: str = "ts",
                   window: str = "1 minute", slide: str | None = None,
                   watermark: str = "2 minutes",
                   keys: tuple = ("source",),
                   value_col: str = "n_tok") -> DataFrame:
    """Event-time windowed ingest stats with a watermark — docs and
    token mass per (window, keys) over a stream.

    The watermark IS the state bound: windows older than
    max(event_time) - watermark are finalized and evicted, and rows
    arriving later than that are dropped (the late-data contract), so
    state size is O(active windows x key cardinality) regardless of how
    long the stream runs. The aggregation is algebraic (count/sum), so
    Spark applies map-side partial aggregation before the one shuffle
    on (window, keys)."""
    from pyspark.sql import functions as F

    w = F.window(F.col(time_col), window, slide or window)
    agg = (
        stream_df.withWatermark(time_col, watermark)
        .groupBy(w.alias("win"), *[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("docs"),
             F.sum(value_col).alias("tokens"))
    )
    return agg.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        *[F.col(k) for k in keys],
        F.col("docs"), F.col("tokens"))


def decode_stream(spark: SparkSession, out_dir: str,
                  columns: list[str] | None = None,
                  predicate: list[tuple] | None = None,
                  schema=None) -> DataFrame:
    """All committed epochs as one DataFrame — ONE binaryFile scan + one
    mapInArrow over every committed part across every epoch (the schema
    is identical across epochs by construction; this is asserted).

    The naive per-epoch ``decode().unionByName()`` chain costs O(epochs)
    plan nodes and driver-side manifest parses per query — at thousands
    of epochs of a long-running stream the driver chokes before the
    cluster does. Here the driver reads the manifests once, flattens the
    (path, crc) list, and the executed plan carries a single scan node
    regardless of epoch count. Per-epoch crcs stay enforced (the crc map
    is keyed by "epoch-dir/file", so identically-named parts of
    different epochs cannot alias).

    ``schema`` -> the same read-side schema EVOLUTION as
    :func:`zseq.decode.decode`: a superset reader schema whose new
    nullable columns are L6-default-filled — a long-lived stream whose
    consumers grew columns keeps reading every epoch ever committed,
    still through one scan node."""
    import pyarrow as pa

    from . import decode as zdec
    from .encode import read_manifest
    from .session import ship_package

    ship_package(spark)
    epochs = committed_epochs(out_dir)
    if not epochs:
        raise FileNotFoundError(f"no committed epochs in {out_dir}")
    paths: list[str] = []
    crcs: dict[str, int] = {}
    schema_hex: str | None = None
    baseline: str | None = None  # the epoch the schema actually came from
    names: list[str] = []
    parsed = None
    for d in epochs:
        m = read_manifest(d)
        if m is None:  # raced with an in-flight commit; listed = committed
            continue
        if schema_hex is None:
            schema_hex, names = m["schema"], list(m["schema_names"])
            baseline = d
            parsed = pa.ipc.read_schema(
                pa.py_buffer(bytes.fromhex(schema_hex)))
        elif m["schema"] != schema_hex:
            raise ValueError(
                f"{d}: epoch schema differs from {baseline} — the stream "
                "was restarted with a different schema; compact or read "
                "the epoch ranges separately")
        base = os.path.basename(os.path.normpath(d))
        # driver-side file pruning per epoch: zone envelopes + null
        # counts + hash-bucket pinning (foreachBatch epochs commit via
        # encode(mode='hash'), so a point lookup touches one file per
        # epoch) — a year of epochs narrows to the files that can match
        # before one task launches
        kept = m.get("parts", [])
        if predicate:
            pcol = m.get("partition_col")
            kept = zseqfile.prune_parts(
                kept, predicate, mode=m.get("mode"), partition_col=pcol,
                partitions=m.get("partitions"),
                key_type=(parsed.field(pcol).type
                          if pcol in set(names) else None))
        for p in kept:
            paths.append(os.path.join(d, p["file"]))
            crcs[f"{base}/{p['file']}"] = p["crc32"]
    if schema_hex is None:
        raise FileNotFoundError(f"no committed epochs in {out_dir}")
    if schema is not None:
        reader_struct, read_cols, new_names, written = \
            zdec.evolved_read_plan(schema, schema_hex, columns)
        base = zdec._df_from_parts(spark, paths, crcs, written, names,
                                   read_cols, predicate)
        return zdec.apply_evolution(base, reader_struct, new_names,
                                    columns)
    if columns is not None:
        missing = set(columns) - set(names)
        if missing:
            raise KeyError(f"zseq: unknown columns {sorted(missing)}")
    return zdec._df_from_parts(spark, paths, crcs, parsed, names,
                               columns, predicate)
