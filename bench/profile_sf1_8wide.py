"""Attribute the sf1 8-wide Spark-vs-pool gap: scheduling gaps or
slower tasks?

BENCH/sf1_scaling.json run 4 reads Spark local[8] ~1.6x slower than the
process-pool control running the literal task body on the same input
(best-of-reps 105 s vs 65 s), while at local[2] Spark BEATS the pool
(165 s vs 231 s). This script separates the two possible causes at the
8-wide level:

- per-task slowness: the worker-side body (pyarrow read -> cluster ->
  codecs -> write -> fsync) is itself slower under Spark than under
  multiprocessing — visible as sum(task wall_sec) differing between the
  two runners on identical files;
- scheduling/straggler gaps: tasks are equally fast but cores sit idle
  between them — visible as a low busy fraction
  (sum(task wall) / (8 x wall clock)) with matching per-task sums.

Usage: python bench/profile_sf1_8wide.py [reps]
Writes BENCH/sf1_8wide_profile.json and prints one JSON line.
Interleaves spark/pool within every rep so a host-contention window
hits both runners alike. Reuses bench.py's materialize stage (64 files,
15M docs) in a temp dir; ~6-10 min per rep pair.
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (bench.py at the repo root)

CORES = 8


def _spark_run(work: str) -> dict:
    """One spark@8 encode with per-part wall_sec kept."""
    from zseq import encode as zenc

    spark = bench._session(CORES)
    bench._warmup(spark, CORES)
    out = os.path.join(work, "enc_prof")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    res = zenc.encode_parquet(spark, os.path.join(work, "tokens_input"),
                              out)
    dt = time.time() - t0
    walls = sorted(p["wall_sec"] for p in res.parts)
    return {"runner": "spark", "wall_clock": round(dt, 3),
            "task_walls": walls}


def _pool_encode_timed(args: tuple) -> float:
    import time as _t

    import pyarrow.parquet as pq

    from zseq.encode import _encode_table_to_file

    path, out_dir = args
    t0 = _t.time()
    tbl = pq.read_table(path, use_threads=False)
    _encode_table_to_file(
        tbl, out_dir, 0, tbl.schema, True, 1 << 16, _t.time(), None,
        fname=os.path.basename(path) + ".zseq")
    return _t.time() - t0


def _pool_run(work: str) -> dict:
    from multiprocessing import get_context

    files = sorted(glob.glob(os.path.join(work, "tokens_input",
                                          "*.parquet")))
    out = os.path.join(work, "pool_prof")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    ctx = get_context("spawn")
    try:
        with ctx.Pool(CORES, initializer=bench._pool_init) as p:
            p.map(bench._pool_warm, range(CORES * 2), chunksize=1)
            t0 = time.time()
            walls = p.map(_pool_encode_timed,
                          [(f, out) for f in files], chunksize=1)
            dt = time.time() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return {"runner": "pool", "wall_clock": round(dt, 3),
            "task_walls": sorted(round(w, 3) for w in walls)}


def _summ(r: dict) -> dict:
    walls = r["task_walls"]
    s = sum(walls)
    return {
        "runner": r["runner"],
        "wall_clock": r["wall_clock"],
        "sum_task_wall": round(s, 1),
        "busy_frac": round(s / (CORES * r["wall_clock"]), 3),
        "task_p50": round(statistics.median(walls), 2),
        "task_max": round(max(walls), 2),
    }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    # bench.BENCH_DOCS is bound at import; the sf1 corpus is 10x it
    bench.BENCH_DOCS = int(os.environ.get(
        "ZSEQ_SF1_DOCS", str(bench.BENCH_DOCS * 10)))
    work = tempfile.mkdtemp(prefix="zseq_prof8_")
    runs = []
    try:
        bench.stage_materialize(work, partitions=64)
        for _ in range(reps):
            runs.append(_summ(_spark_run(work)))
            runs.append(_summ(_pool_run(work)))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    out = {"cores": CORES, "reps": reps, "runs": runs,
           "measured_unix": int(time.time())}
    with open(os.path.join(REPO, "BENCH", "sf1_8wide_profile.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
