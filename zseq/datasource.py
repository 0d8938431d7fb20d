"""Native Spark DataSource: ``spark.read.format("zseq")`` and
``df.write.format("zseq")``.

The Spark-first integration of the .zseq format, built on the Python
DataSource API (Spark 4.0) with filter pushdown (Spark 4.1):

read
    One InputPartition per committed part file (manifest-driven, so a
    blob never splits and one task decodes one file — same plan shape as
    ``zseq.decode``). Catalyst pushes comparison filters through
    ``pushFilters()``; int, timestamp/date, string, and startswith
    comparisons become zone-map block pruning inside the reader (a
    conservative superset — whole blocks are skipped without
    decompression), and ALL filters are handed back to Spark so exact row
    filtering still happens JVM-side: the parquet model. Column pruning: ``.option("columns", "a,b")`` (the Python DS
    API has no required-columns pushdown yet); pruned columns are seeked
    past in the blob, never decompressed.

write
    Each task encodes its partition into one .zseq file (Arrow batches
    straight in via ``DataSourceArrowWriter`` — no row conversion), the
    driver commits ``manifest.json`` exactly once from the per-task
    commit messages. Task files are written tmp-then-rename, so retries
    are idempotent and ``abort()`` leaves no committed state — the same
    exactly-once story as ``zseq.encode``.

Usage::

    from zseq.datasource import register
    register(spark)                       # ships the package + registers
    df.write.format("zseq").mode("overwrite").save(path)
    spark.read.format("zseq").load(path).filter("n_tok = 17")

Rebuilds the reference's convert entry point (zbra-cli main.rs:404-445)
as a declarative Spark source/sink instead of a subcommand.

Known environment caveat: this Spark/pyarrow pairing intermittently
corrupts MAP-typed Arrow batches on the JVM->Python transfer (worst for
deeply nested maps from parquet scans). ``zseq.encode`` sidesteps it by
shipping maps as entries arrays (encode.strip_maps_df); the DataSource
writers cannot pre-transform their input, so they defensively IPC-copy
map-bearing batches (encode.own_batches). For heavy map-typed datasets
prefer ``zseq.encode``/``zseq.decode``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterable, Iterator, List, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_PUSHABLE = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}


@dataclass
class ZseqPartition(InputPartition):
    path: str
    crc32: int | None


@dataclass
class ZseqPartGroup(InputPartition):
    """A batch-read task: several whole part files ((path, crc32) pairs).
    Packing multiple blobs per InputPartition amortizes the per-partition
    Python-runner setup the DataSource API pays (measured ~3x on a
    many-small-parts corpus vs zseq.decode's one-scan plan)."""
    files: tuple


@dataclass
class ZseqCommit(WriterCommitMessage):
    part: dict | None


def _revision_opt(options: dict) -> int | None:
    """Time-travel option: .option('revision', N) reads the dataset as
    of that retained manifest revision (same contract as
    decode(revision=...); `python -m zseq history` lists them)."""
    r = options.get("revision")
    return int(r) if r is not None else None


def _arrow_schema_from_manifest(m: dict):
    import pyarrow as pa

    return pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(m["schema"])))


def register(spark) -> None:
    """Ship the package to executors and register the 'zseq' format.
    Python-source filter pushdown is off by default in Spark 4.1 — turn
    it on, else a reader implementing pushFilters() is refused."""
    from .session import ship_package

    ship_package(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ZseqDataSource)


class ZseqDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "zseq"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("zseq: .load(path)/.save(path) is required")
        return path

    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema

        from .encode import read_manifest

        m = read_manifest(self._path(), revision=_revision_opt(self.options))
        if m is None:
            # Streaming layout: schema from the first committed epoch.
            from .streaming import committed_epochs

            eps = committed_epochs(self._path())
            if eps:
                m = read_manifest(eps[0])
        if m is None:
            raise FileNotFoundError(
                f"{self._path()}/manifest.json missing — not a committed "
                "zseq dataset")
        schema = _arrow_schema_from_manifest(m)
        cols = self.options.get("columns")
        if cols:
            keep = [c.strip() for c in cols.split(",") if c.strip()]
            missing = set(keep) - set(schema.names)
            if missing:
                raise KeyError(f"zseq: unknown columns {sorted(missing)}")
            schema = pa_select(schema, keep)
        return from_arrow_schema(schema)

    def reader(self, schema: StructType) -> "ZseqSourceReader":
        # schema is DataSource.schema()'s result (possibly projected by
        # the columns option) OR a user-supplied .schema(...) — the
        # reader treats a superset as read-side evolution (new nullable
        # columns filled with L6 defaults) and a subset as projection.
        return ZseqSourceReader(dict(self.options), schema)

    def writer(self, schema: StructType,
               overwrite: bool) -> "ZseqSourceWriter":
        return ZseqSourceWriter(dict(self.options), schema, overwrite)

    def streamWriter(self, schema: StructType,
                     overwrite: bool) -> "ZseqStreamWriter":
        return ZseqStreamWriter(dict(self.options), schema)

    def streamReader(self, schema: StructType) -> "ZseqStreamReader":
        return ZseqStreamReader(dict(self.options))


def pa_select(schema, keep: list[str]):
    """Project an Arrow schema to ``keep`` in file order."""
    import pyarrow as pa

    sel = set(keep)
    return pa.schema([schema.field(n) for n in schema.names if n in sel])


def _read_verified_blob(path: str, crc32: int | None):
    """Open a part file, enforce the manifest crc, return its reader."""
    from .zseqfile import ZseqReader, check_crc

    with open(path, "rb") as f:
        content = f.read()
    check_crc(content, crc32, path)
    return ZseqReader(content)


class ZseqSourceReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType | None = None):
        from .encode import read_manifest

        self._dir = options.get("path")
        if not self._dir:
            # reachable without DataSource.schema()'s guard when the
            # user supplies an explicit schema — fail with the intended
            # message, not a TypeError from os.path.join(None, ...)
            raise ValueError("zseq: .load(path) is required")
        m = read_manifest(self._dir, revision=_revision_opt(options))
        if m is None:
            from .streaming import committed_epochs

            if committed_epochs(self._dir):
                raise ValueError(
                    f"{self._dir} is a streaming-epoch layout — read it as "
                    "a stream with spark.readStream.format('zseq'), or "
                    "merge it into a batch dataset first with "
                    "'python -m zseq compact'")
            raise FileNotFoundError(
                f"{self._dir}/manifest.json missing — not a committed "
                "zseq dataset")
        self._names = list(m["schema_names"])
        cols = options.get("columns")
        self._columns = ([c.strip() for c in cols.split(",") if c.strip()]
                         if cols else None)
        # Reconcile the Spark-provided read schema with the written one.
        # Identical -> fast path (emit decoded batches as-is). A subset
        # is projection; extra nullable fields are read-side EVOLUTION
        # (filled with L6 defaults per batch); a reorder is honored.
        # Type changes / non-nullable new fields are refused up front.
        self._emit = None
        if schema is not None:
            from pyspark.sql.pandas.types import to_arrow_schema

            from .decode import evolution_fields, spark_normalized

            reader_arrow = to_arrow_schema(schema)
            # compare in the Spark-normalized type domain: a dataset
            # written via the parquet fast path may carry types that
            # don't round-trip through StructType (large_string etc.) —
            # a plain full read must keep working
            written_arrow = spark_normalized(_arrow_schema_from_manifest(m))
            extra = evolution_fields(written_arrow, reader_arrow,
                                     allow_subset=True)
            rnames = list(reader_arrow.names)
            if rnames != self._names:
                present = [n for n in rnames if n in set(self._names)]
                in_written_order = [n for n in self._names
                                    if n in set(rnames)]
                if not extra and present == in_written_order:
                    # pure projection in written order: the decoded
                    # batches already match — no per-batch rebuild
                    self._columns = present
                else:
                    self._columns = present or [self._names[0]]
                    self._emit = reader_arrow
        # Size each part from the manifest; a manifest written without
        # enc_bytes (older revision / foreign writer) would otherwise
        # make every part weigh 0 and pack the whole dataset into ONE
        # InputPartition, serializing the read — fall back to the actual
        # file size on disk (and only then to 0, which the packer floors
        # by parallelism anyway).
        def _psize(path: str, p: dict) -> int:
            n = int(p.get("enc_bytes", 0))
            if n > 0:
                return n
            try:
                return os.path.getsize(path)
            except OSError:
                return 0

        self._parts = [
            (os.path.join(self._dir, p["file"]), p.get("crc32"),
             _psize(os.path.join(self._dir, p["file"]), p),
             p.get("zones"), p.get("part_id"))
            for p in m.get("parts", [])
        ]
        # hash-bucket pruning inputs (prune_parts): only a pure
        # mode='hash' manifest carries the part_id == pmod(hash(key), P)
        # guarantee (append/compact/salted all void it, and record a
        # different mode)
        self._mode = m.get("mode")
        self._pcol = m.get("partition_col")
        self._pcount = m.get("partitions")
        # Task sizing: pack part files into ~target-byte groups, floored
        # by the session's parallelism so a small corpus still fans out to
        # every core. At scale (parts >= target bytes) this degenerates to
        # one file per task — the same plan shape as zseq.decode.
        self._target_bytes = int(
            options.get("target_partition_bytes", 128 << 20))
        # Parallelism floor. The reader is constructed inside Spark's
        # spawned planning worker, where getActiveSession() is usually
        # None — so an explicit .option("min_partitions", N) wins, then
        # the session (when visible), then the machine's core count
        # (right for local mode; a sane per-node floor on a cluster).
        mp = int(options.get("min_partitions", 0))
        if mp > 0:
            self._min_tasks = mp
        else:
            try:
                from pyspark.sql import SparkSession

                active = SparkSession.getActiveSession()
                self._min_tasks = (
                    active.sparkContext.defaultParallelism if active
                    else max(8, os.cpu_count() or 8))
            except Exception:
                self._min_tasks = max(8, os.cpu_count() or 8)
        # Zone maps exist for int-kind chunks (ints, timestamps, dates in
        # their storage domain) and for binary/string chunks (truncated
        # byte bounds) — those columns accept pushdown.
        import pyarrow as pa

        sch = _arrow_schema_from_manifest(m)
        self._ptype = (sch.field(self._pcol).type
                       if self._pcol and self._pcol in sch.names else None)
        self._pushtypes = {
            f.name: f.type for f in sch
            if pa.types.is_integer(f.type) or pa.types.is_temporal(f.type)
            or pa.types.is_string(f.type) or pa.types.is_large_string(f.type)
            or pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type)
            or pa.types.is_decimal128(f.type)
        }
        self._predicate: list[tuple] = []

    def _storage_value(self, col: str, value) -> int | str | bytes | None:
        """Catalyst literal -> the column's storage domain: ints stay
        ints, timestamps/dates become their epoch storage ints, string
        literals stay str (compared bytewise against byte-bounds zone
        maps), bytes stay bytes. None when the value is not exactly
        representable (pruning must stay conservative, so we don't push)."""
        import datetime

        import pyarrow as pa

        t = self._pushtypes.get(col)
        if t is None or isinstance(value, bool):
            return None
        if pa.types.is_decimal(t):
            # decimal zone maps (single- AND two-limb) live in the
            # UNSCALED int domain; push only literals exactly
            # representable at the column's scale (a 28-digit default
            # Decimal context would round, so widen it).
            import decimal as _dec

            if not isinstance(value, _dec.Decimal):
                return None
            with _dec.localcontext() as ctx:
                ctx.prec = 60
                scaled = value.scaleb(t.scale)
                if scaled != scaled.to_integral_value():
                    return None
                return int(scaled)
        if isinstance(value, str):
            return value if (pa.types.is_string(t)
                             or pa.types.is_large_string(t)) else None
        if isinstance(value, (bytes, bytearray)):
            return bytes(value) if (pa.types.is_binary(t)
                                    or pa.types.is_large_binary(t)) else None
        if isinstance(value, int):
            return value if pa.types.is_integer(t) else None
        if isinstance(value, datetime.datetime) and pa.types.is_timestamp(t):
            if value.tzinfo is None:
                value = value.replace(tzinfo=datetime.timezone.utc)
            us = (value - datetime.datetime(
                1970, 1, 1, tzinfo=datetime.timezone.utc)) \
                // datetime.timedelta(microseconds=1)
            scale = {"s": -1_000_000, "ms": -1_000, "us": 1, "ns": 1_000}
            k = scale.get(t.unit)
            if k is None:
                return None
            if k > 0:
                return us * k
            if us % (-k):
                return None  # not exactly representable in storage unit
            return us // (-k)
        if isinstance(value, datetime.date) \
                and not isinstance(value, datetime.datetime) \
                and pa.types.is_date32(t):
            return (value - datetime.date(1970, 1, 1)).days
        return None

    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        from pyspark.sql.datasource import StringStartsWith

        from pyspark.sql.datasource import IsNotNull, IsNull

        for f in filters:
            if len(getattr(f, "attribute", ())) != 1:
                continue
            col = f.attribute[0]
            if isinstance(f, (IsNull, IsNotNull)):
                # any written column qualifies (null counts are tracked
                # for every column, typed or not); prunes files whose
                # manifest says 0 nulls / all nulls
                if col in set(self._names):
                    self._predicate.append(
                        (col, "isnull" if isinstance(f, IsNull)
                         else "notnull", None))
                continue
            if isinstance(f, In):
                vals = [self._storage_value(col, v) for v in f.value]
                if vals and all(v is not None for v in vals):
                    self._predicate.append((col, "in", tuple(vals)))
                continue
            if isinstance(f, StringStartsWith):
                # prefix p -> the range [p, increment(p)): every string
                # with prefix p sorts inside it (bytewise == UTF-8
                # codepoint order), so two range conjuncts prune exactly
                # like parquet does for startswith.
                from .column import prefix_upper

                p = self._storage_value(col, f.value)
                if isinstance(p, str) and p:
                    self._predicate.append((col, ">=", p))
                    up = prefix_upper(p.encode())
                    if up is not None:
                        self._predicate.append((col, "<", up))
                continue
            op = _PUSHABLE.get(type(f))
            if op is None:
                continue
            v = self._storage_value(col, f.value)
            if v is not None:
                self._predicate.append((col, op, v))
        # Block pruning is a conservative superset — every filter is
        # returned unhandled so Spark still applies it exactly.
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        parts = self._parts
        if parts and self._predicate:
            # Driver-side FILE pruning (pushFilters ran before
            # partitions() per the DataSource contract): zone envelopes
            # + hash-bucket pinning via the shared zseqfile.prune_parts
            # — a pruned file never becomes an InputPartition, so the
            # cluster never launches a task for it. Conservative
            # superset — Spark re-applies every filter exactly
            # (pushFilters returns them all unhandled).
            from .zseqfile import prune_parts

            keep = prune_parts(
                [{"zones": t[3], "part_id": t[4], "_t": t}
                 for t in parts],
                self._predicate, mode=self._mode,
                partition_col=self._pcol, partitions=self._pcount,
                key_type=self._ptype)
            parts = [p["_t"] for p in keep]
        if not parts:
            # a committed EMPTY dataset (or a fully-pruned read) must
            # yield an empty DataFrame: returning [] here makes Spark's
            # planning worker call read(None), which crashes the job
            return [ZseqPartGroup(())]
        total = sum(s for _, _, s, _, _ in parts)
        if total == 0 and len(parts) > 1:
            # No size information at all (manifest lacks enc_bytes and
            # the files are unreadable/empty): count-based packing so the
            # read still fans out instead of serializing on one task.
            per = -(-len(parts) // max(1, self._min_tasks))
            return [ZseqPartGroup(tuple(
                        (path, crc)
                        for path, crc, _, _, _ in parts[i:i + per]))
                    for i in range(0, len(parts), per)]
        # effective group size: never larger than the byte target, never
        # so large that fewer than min_tasks groups cover the dataset
        eff = max(1, min(self._target_bytes,
                         -(-total // max(1, self._min_tasks))))
        groups: list[ZseqPartGroup] = []
        cur: list[tuple] = []
        cur_bytes = 0
        for path, crc, size, _zones, _pid in parts:
            if cur and cur_bytes + size > eff:
                groups.append(ZseqPartGroup(tuple(cur)))
                cur, cur_bytes = [], 0
            cur.append((path, crc))
            cur_bytes += size
        if cur:
            groups.append(ZseqPartGroup(tuple(cur)))
        return groups

    def read(self, partition: ZseqPartGroup):
        for path, crc in partition.files:
            r = _read_verified_blob(path, crc)
            if list(r.schema.names) != self._names:
                raise ValueError(
                    f"{path}: schema {r.schema.names} != manifest "
                    f"{self._names}")
            if self._emit is None:
                yield from r.batches(self._columns,
                                     self._predicate or None)
            else:
                from .decode import evolve_batch

                for b in r.batches(self._columns, self._predicate or None):
                    yield evolve_batch(b, self._emit)


class ZseqSourceWriter(DataSourceArrowWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        import uuid

        from pyspark.sql.pandas.types import to_arrow_schema

        from .encode import read_manifest

        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("zseq: .save(path) is required")
        prev = read_manifest(self._dir)
        self._overwrite = overwrite
        self._old_files = {p["file"] for p in (prev or {}).get("parts", [])}
        # Job-unique file-name token: new parts can NEVER clobber a
        # previously committed dataset's files, so the atomic manifest
        # write is the single commit point (crash before it leaves the
        # old dataset fully intact; readers only follow the manifest).
        self._token = uuid.uuid4().hex[:8]
        from .codecs.bytescodecs import validate_zstd_level

        lvl = options.get("zstd_level")
        self._zstd = int(lvl) if lvl else None
        validate_zstd_level(self._zstd)
        self._cluster = str(options.get("cluster", "true")).lower() != "false"
        self._batch_rows = int(options.get("batch_rows", 1 << 16))
        self._schema = to_arrow_schema(schema)
        # .mode('append') reaches here as overwrite=False. Appending to
        # a committed dataset follows the encode-module protocol: exact
        # schema/zstd match validated UP FRONT (before any task runs),
        # part ids offset past the committed ones, revision-CAS commit.
        self._append_prev = None
        self._part_base = 0
        if not overwrite and prev is not None:
            from .encode import check_append_compat

            # the DataSource writer has no reversed_cols option, so the
            # written parts carry none — a reversed committed dataset
            # fails the schema-hex check (the marker lives in schema
            # metadata) with the right message
            check_append_compat(prev, self._schema, self._zstd, None)
            self._append_prev = prev
            self._part_base = 1 + max(
                (p["part_id"] for p in prev.get("parts", [])), default=-1)
        os.makedirs(self._dir, exist_ok=True)

    def write(self, iterator: Iterator) -> ZseqCommit:
        import time

        import pyarrow as pa
        from pyspark import TaskContext

        from .encode import _encode_table_to_file, own_batches

        t0 = time.time()
        batches = own_batches(list(iterator))
        if not batches:
            return ZseqCommit(None)
        pid = TaskContext.get().partitionId() + self._part_base
        tbl = pa.Table.from_batches(batches).combine_chunks()
        row = _encode_table_to_file(
            tbl, self._dir, pid, self._schema, self._cluster,
            self._batch_rows, t0, self._zstd,
            fname=f"part-{self._token}-{pid:05d}.zseq")
        return ZseqCommit(row)

    def commit(self, messages) -> None:
        from .encode import build_manifest

        parts = [m.part for m in messages if m is not None and m.part]
        parts.sort(key=lambda p: p["part_id"])
        if self._append_prev is not None:
            from .encode import append_commit

            append_commit(self._dir, self._append_prev, parts,
                          self._schema, self._zstd, None, self._token)
            return
        # revision continues from whatever manifest is live at commit
        # time (NOT truthiness of old parts — a committed EMPTY dataset
        # is still revision >= 1 and must not reset the counter the
        # append CAS relies on)
        from .encode import read_manifest

        cur = read_manifest(self._dir)
        prev_rev = cur.get("revision", 1) if cur is not None else 0
        manifest = build_manifest(
            mode="datasource", partitions=len(parts),
            arrow_schema=self._schema, parts=parts, zstd_level=self._zstd,
            extra={"revision": prev_rev + 1})
        # The manifest swap IS the commit; only then GC the files this
        # job is entitled to delete (the superseded manifest's parts and
        # our own token-named leftovers — never a concurrent writer's or
        # a crashed job's salvageable parts; readers never glob).
        from .encode import commit_manifest, gc_unreferenced

        # fresh/overwrite path: superseded parts get GC'd, so retained
        # snapshots reset (append commits above retain history)
        commit_manifest(self._dir, manifest, reset_history=True)
        gc_unreferenced(self._dir, {p["file"] for p in parts},
                        self._old_files, self._token)

    def abort(self, messages) -> None:
        # Remove only THIS job's files (token-named); the committed
        # dataset's files and manifest are untouched.
        try:
            names = os.listdir(self._dir)
        except OSError:
            return
        for f in names:
            if f.startswith(f"part-{self._token}-") and f.endswith(".zseq"):
                try:
                    os.remove(os.path.join(self._dir, f))
                except OSError:
                    pass


class ZseqStreamWriter(DataSourceStreamArrowWriter):
    """Streaming sink: ``df.writeStream.format("zseq").start(path)``.

    Same epoch layout as zseq.streaming (epoch-<id>/ part files +
    manifest), but driven by the engine's streaming commit protocol
    instead of foreachBatch: tasks stage their encoded part under
    .staging/ (they do not know the batch id), and commit(batchId) moves
    the staged files into the epoch directory and writes its manifest
    atomically — a replayed epoch that already committed is a no-op
    (exactly-once), abort removes the staged files.

    CAVEAT (same semantics as Spark's built-in file sink, whose
    _spark_metadata log lives in the output dir): the epoch manifests in
    the OUTPUT directory are the commit log. Starting a NEW query (fresh
    checkpoint) against a directory that already holds epochs treats
    those epoch ids as committed and silently skips the colliding batch
    ids — restart-replay exactly-once depends on this, so it cannot be
    distinguished from a collision. Use a fresh output directory per
    logical stream, or `python -m zseq compact` the old one first.
    """

    def __init__(self, options: dict, schema: StructType):
        import uuid

        from pyspark.sql.pandas.types import to_arrow_schema

        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("zseq: .start(path) is required")
        from .codecs.bytescodecs import validate_zstd_level

        lvl = options.get("zstd_level")
        self._zstd = int(lvl) if lvl else None
        validate_zstd_level(self._zstd)
        self._cluster = str(options.get("cluster", "true")).lower() != "false"
        self._batch_rows = int(options.get("batch_rows", 1 << 16))
        self._schema = to_arrow_schema(schema)
        # Query-unique staging token: two concurrent streaming queries
        # writing the same path must never GC each other's staged parts
        # (a shared .staging sweep would make the victim's os.replace at
        # commit fail and abort its micro-batch).
        self._token = uuid.uuid4().hex[:8]
        self._staging = os.path.join(self._dir, ".staging")
        os.makedirs(self._staging, exist_ok=True)

    def write(self, iterator: Iterator) -> ZseqCommit:
        import time

        import pyarrow as pa
        from pyspark import TaskContext

        from .encode import _encode_table_to_file, own_batches

        t0 = time.time()
        batches = own_batches(list(iterator))
        if not batches:
            return ZseqCommit(None)
        # Task attempt id is unique across retries within the query run —
        # the staged name can never collide; commit renumbers.
        aid = int(TaskContext.get().taskAttemptId())
        tbl = pa.Table.from_batches(batches).combine_chunks()
        row = _encode_table_to_file(
            tbl, self._staging, aid, self._schema, self._cluster,
            self._batch_rows, t0, self._zstd,
            fname=f"part-{self._token}-{aid:05d}.zseq")
        return ZseqCommit(row)

    def commit(self, messages, batchId: int) -> None:
        from .encode import _atomic_write_json, build_manifest
        from .streaming import epoch_dir

        parts = [m.part for m in messages if m is not None and m.part]
        parts.sort(key=lambda p: p["part_id"])
        dest = epoch_dir(self._dir, batchId)
        if os.path.exists(os.path.join(dest, "manifest.json")):
            # replayed epoch: already committed — drop the staged files
            for p in parts:
                try:
                    os.remove(os.path.join(self._staging, p["file"]))
                except OSError:
                    pass
            self._gc_staging()
            return
        os.makedirs(dest, exist_ok=True)
        for i, p in enumerate(parts):
            new = f"part-{i:05d}.zseq"
            os.replace(os.path.join(self._staging, p["file"]),
                       os.path.join(dest, new))
            p["file"] = new
            p["part_id"] = i
        self._gc_staging()
        manifest = build_manifest(
            mode="stream", partitions=len(parts),
            arrow_schema=self._schema, parts=parts, zstd_level=self._zstd,
            extra={"epoch": int(batchId)})
        _atomic_write_json(os.path.join(dest, "manifest.json"), manifest)

    def _gc_staging(self) -> None:
        """Remove staged leftovers from THIS QUERY's dead/superseded task
        attempts — only files carrying our query token. Safe at commit
        time: our epoch's surviving files were just moved out, every
        other token-matched file belongs to an attempt whose commit
        message never arrived, and a still-running zombie writes
        tmp-then-rename, so at worst its orphan reappears and the NEXT
        commit collects it. A concurrent query's staged parts (different
        token) are never touched."""
        try:
            names = os.listdir(self._staging)
        except OSError:
            return
        prefix = f"part-{self._token}-"
        for f in names:
            if f.startswith(prefix) and ".zseq" in f:
                try:
                    os.remove(os.path.join(self._staging, f))
                except OSError:
                    pass

    def abort(self, messages, batchId: int) -> None:
        for m in messages or []:
            if m is not None and m.part:
                try:
                    os.remove(os.path.join(self._staging, m.part["file"]))
                except OSError:
                    pass


class ZseqStreamReader(DataSourceStreamReader):
    """Streaming source: ``spark.readStream.format("zseq").load(path)``
    tails the committed epochs under ``path`` (the layout both the
    foreachBatch path and the zseq stream sink produce).

    Offset = count of committed epoch directories consumed. An epoch's
    manifest write is atomic, so an epoch is either fully visible or
    invisible — the offset can never split an epoch. Each micro-batch
    gets one InputPartition per part file of the newly committed epochs
    (no splits, crc-verified), so the read parallelism equals the part
    count exactly like the batch reader."""

    def __init__(self, options: dict):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("zseq: .load(path) is required")
        cols = options.get("columns")
        # schema() applies this projection — the yielded batches must too
        self._columns = ([c.strip() for c in cols.split(",") if c.strip()]
                         if cols else None)

    def initialOffset(self) -> dict:
        return {"epochs": 0}

    def latestOffset(self) -> dict:
        from .streaming import committed_epochs

        return {"epochs": len(committed_epochs(self._dir))}

    def partitions(self, start: dict, end: dict):
        from .encode import read_manifest
        from .streaming import committed_epochs

        eps = committed_epochs(self._dir)[start["epochs"]:end["epochs"]]
        parts = []
        for d in eps:
            m = read_manifest(d)
            for p in (m or {}).get("parts", []):
                parts.append(ZseqPartition(
                    os.path.join(d, p["file"]), p.get("crc32")))
        # an epoch can be empty (empty micro-batch) — Spark still needs
        # at least one partition to advance the offset
        return parts or [ZseqPartition("", None)]

    def read(self, partition: ZseqPartition):
        if not partition.path:
            return
        r = _read_verified_blob(partition.path, partition.crc32)
        yield from r.batches(self._columns)

    def commit(self, end: dict) -> None:
        pass
