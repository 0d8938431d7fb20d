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

Every measured stage runs via bench._run_stage in its OWN subprocess /
fresh JVM (an in-process materialize leaves a local[32] session behind
that getOrCreate silently reuses — the first version of this script did
exactly that, and its "local[8]" runs showed 21 concurrent tasks).

Usage: python bench/profile_sf1_8wide.py [reps]
Writes BENCH/sf1_8wide_profile.json and prints one JSON line.
Interleaves spark/pool within every rep so a host-contention window
hits both runners alike. ~4-6 min per rep pair after materialize.
"""
from __future__ import annotations

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


def _summ(runner: str, r: dict) -> dict:
    walls = r["task_walls"]
    s = sum(walls)
    return {
        "runner": runner,
        "wall_clock": r["sec"],
        "sum_task_wall": round(s, 1),
        "busy_frac": round(s / (CORES * r["sec"]), 3),
        "task_p50": round(statistics.median(walls), 2),
        "task_max": round(max(walls), 2),
    }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    os.environ["ZSEQ_BENCH_DOCS"] = os.environ.get(
        "ZSEQ_SF1_DOCS", str(bench.BENCH_DOCS * 10))  # stages inherit
    work = tempfile.mkdtemp(prefix="zseq_prof8_")
    runs = []
    try:
        bench._run_stage(work, "materialize", "64")
        for _ in range(reps):
            runs.append(_summ("spark",
                              bench._run_stage(work, "encode",
                                               str(CORES))))
            runs.append(_summ("pool",
                              bench._run_stage(work, "pool",
                                               str(CORES))))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    out = {"cores": CORES, "reps": reps, "runs": runs,
           "stage_retries": bench.RETRY_LOG,
           "measured_unix": int(time.time())}
    with open(os.path.join(REPO, "BENCH", "sf1_8wide_profile.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
