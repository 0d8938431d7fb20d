#!/usr/bin/env python
"""Round-6 optimization harness — measurement only, NOT the graded bench.

bench.py is frozen for measurement; this file holds the extra
instrumentation the optimization round needs (guide §1):

  profile-kernel   cProfile of the single-core encode/decode kernel
                   (zseqfile.encode_table / decode_table) on the synth
                   chunk — where does the 21M tok/s ceiling go?
  profile-task     cProfile of the LITERAL Spark task body of the bench's
                   encode stage (parquet read + cast + cluster + codecs +
                   write + fsync) on one materialized input file.
  profile-mat      cProfile-free wall breakdown of the materialize stage
                   (synth SQL expression vs parquet write vs count).
  time-queries     wall time of every declared query's build + collect at
                   a given SF dir (the driver's correctness harness cost).

Usage: python bench_extra.py <cmd> [args]
"""

from __future__ import annotations

import cProfile
import io
import json
import os
import pstats
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _print_stats(pr: cProfile.Profile, top: int = 40) -> None:
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(top)
    print(s.getvalue())


def profile_kernel(n_docs: int = 150000, reps: int = 3) -> None:
    import pyarrow.compute as pc

    from zseq import synth, zseqfile

    tbl = synth.tokens_table_arrow(n_docs)
    toks = int(pc.sum(tbl.column("n_tok")).as_py())
    # warm
    buf = zseqfile.encode_table(tbl)
    t0 = time.time()
    for _ in range(reps):
        buf = zseqfile.encode_table(tbl)
    enc = (time.time() - t0) / reps
    t0 = time.time()
    for _ in range(reps):
        zseqfile.decode_table(buf)
    dec = (time.time() - t0) / reps
    print(json.dumps({"tokens": toks, "enc_sec": round(enc, 3),
                      "dec_sec": round(dec, 3),
                      "enc_tok_per_sec": round(toks / enc),
                      "dec_tok_per_sec": round(toks / dec),
                      "enc_bytes": len(buf)}))
    pr = cProfile.Profile()
    pr.enable()
    buf = zseqfile.encode_table(tbl)
    pr.disable()
    print("=== encode profile ===")
    _print_stats(pr)
    pr = cProfile.Profile()
    pr.enable()
    zseqfile.decode_table(buf)
    pr.disable()
    print("=== decode profile ===")
    _print_stats(pr)


def _make_input(work: str, n_docs: int, files: int) -> list[str]:
    """Materialize bench-shaped parquet input WITHOUT Spark (same rows:
    synth fixture is engine-independent)."""
    import pyarrow.parquet as pq

    from zseq import synth

    paths = []
    per = n_docs // files
    for i in range(files):
        tbl = synth.tokens_table_arrow(per, start=i * per)
        p = os.path.join(work, f"part-{i:05d}.parquet")
        pq.write_table(tbl, p, compression="snappy")
        paths.append(p)
    return paths


def profile_task(n_docs: int = 93750) -> None:
    """One bench encode task: the exact body of bench.py's
    _pool_encode_one / zseq.encode._encode_files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from zseq.encode import _encode_table_to_file

    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)
    work = tempfile.mkdtemp(prefix="zseq_prof_")
    try:
        [path] = _make_input(work, n_docs, 1)
        out_dir = os.path.join(work, "out")
        os.makedirs(out_dir)

        def body():
            t0 = time.time()
            tbl = pq.read_table(path, use_threads=False)
            t_read = time.time() - t0
            tbl = tbl.cast(tbl.schema)
            row = _encode_table_to_file(
                tbl, out_dir, 0, tbl.schema, True, 1 << 16, time.time(),
                None, fname="p.zseq")
            return t_read, row

        t_read, row = body()  # warm
        t0 = time.time()
        t_read, row = body()
        wall = time.time() - t0
        print(json.dumps({"read_sec": round(t_read, 3),
                          "task_sec": round(wall, 3),
                          "enc_bytes": row["enc_bytes"],
                          "rows": row["rows"],
                          "list_elems": row["list_elems"]}))
        pr = cProfile.Profile()
        pr.enable()
        body()
        pr.disable()
        _print_stats(pr, 50)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def profile_mat(n_docs: int = 1500000) -> None:
    """Materialize-stage breakdown on local[32] (bench stage_materialize
    shape: 16 partitions)."""
    from zseq import synth
    from zseq.session import get_spark

    spark = get_spark("zseq-profmat", master="local[32]",
                      shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="zseq_mat_")
    try:
        df = synth.tokens_df_range(spark, n_docs, partitions=16)
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        t_gen = time.time() - t0
        path = os.path.join(work, "tokens_input")
        t0 = time.time()
        df.write.mode("overwrite").parquet(path)
        t_write = time.time() - t0
        t0 = time.time()
        back = spark.read.parquet(path)
        rows = back.count()
        toks = int(back.selectExpr("sum(n_tok) as t").collect()[0]["t"])
        t_count = time.time() - t0
        print(json.dumps({"gen_noop_sec": round(t_gen, 3),
                          "write_sec": round(t_write, 3),
                          "count_sec": round(t_count, 3),
                          "rows": rows, "tokens": toks}))
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def time_queries(sf_dir: str = "/root/testdata/sf0.001",
                 only: str | None = None) -> None:
    """Wall time per declared query (build + count via noop write) — the
    correctness-harness cost the driver pays 56 times."""
    from zseq import queries as Q
    from zseq.session import get_spark

    spark = get_spark("zseq-timeq")
    qs = Q.queries()
    out = {}
    for name, fn in qs.items():
        if only and only not in name:
            continue
        spark.sparkContext.setJobDescription(f"timeq:{name}")
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            out[name] = {"sec": round(time.time() - t0, 3), "rows": n}
        except Exception as e:  # noqa: BLE001
            out[name] = {"sec": round(time.time() - t0, 3),
                         "err": repr(e)[:200]}
        print(json.dumps({name: out[name]}), flush=True)
    total = sum(v["sec"] for v in out.values())
    print(json.dumps({"total_sec": round(total, 3), "n": len(out)}))


PLAN_QUERIES = [
    # query paths whose plan shape this round touched (or verified):
    "tokens_synth",          # SQL transform(sequence) -> numpy mapInArrow
    "roundtrip_tokens",      # decode tail of the flagship roundtrip
    "pushdown_projection",   # ReadSchema/pruning through the DataSource
    "pushdown_predicate",
    "dedup_minhash_lsh",
    "fingerprint_winnow",
    "contamination_report",
    "sim_ivf_topk_kmeans",
    "text_analyze",
    "dedup_drop_near",
]


def capture_plans(out_dir: str, sf_dir: str = "/root/testdata/sf0.001",
                  suffix: str = "after") -> None:
    """Write .explain('formatted') for PLAN_QUERIES to
    <out_dir>/<name>_<suffix>.txt (the judge checks plan claims against
    these files)."""
    import contextlib

    from zseq import queries as Q
    from zseq.session import get_spark

    spark = get_spark("zseq-plans")
    os.makedirs(out_dir, exist_ok=True)
    qs = Q.queries()
    for name in PLAN_QUERIES:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"),
                      "w") as f:
                f.write(buf.getvalue())
            print("wrote", name, flush=True)
        except Exception as e:  # noqa: BLE001
            print("FAILED", name, repr(e)[:200], flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "profile-kernel"
    if cmd == "profile-kernel":
        profile_kernel(int(sys.argv[2]) if len(sys.argv) > 2 else 150000)
    elif cmd == "profile-task":
        profile_task(int(sys.argv[2]) if len(sys.argv) > 2 else 93750)
    elif cmd == "profile-mat":
        profile_mat(int(sys.argv[2]) if len(sys.argv) > 2 else 1500000)
    elif cmd == "plans":
        capture_plans(sys.argv[2] if len(sys.argv) > 2
                      else os.path.join(REPO, "plans", "r06"),
                      sf_dir=(sys.argv[3] if len(sys.argv) > 3
                              else "/root/testdata/sf0.001"),
                      suffix=(sys.argv[4] if len(sys.argv) > 4
                              else "after"))
    elif cmd == "time-queries":
        time_queries(sys.argv[2] if len(sys.argv) > 2
                     else "/root/testdata/sf0.001",
                     sys.argv[3] if len(sys.argv) > 3 else None)
    else:
        raise SystemExit(f"unknown cmd {cmd}")
