"""Driver contract for the spark-graft builder (PySpark target).

zseq is a PySpark-native per-column lightweight-compression engine rebuilt
from the capabilities of justanotherdot/zbra (see SURVEY.md). ``entry``
runs the flagship distributed encode -> decode roundtrip; ``queries`` /
``oracle_sql`` expose every operator with DuckDB-checkable semantics.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive the tokens table from sf0.001 documents, run the
    full distributed encode -> .zseq blobs -> decode roundtrip, and return
    the decoded table's per-source checksum summary."""
    from zseq import queries as Q

    df = Q.q_roundtrip_tokens(spark, "/root/testdata/sf0.001")
    return df.groupBy("source").agg(
        {"tok_sum": "sum", "n_tok": "sum", "*": "count"}
    ).selectExpr(
        "source",
        "cast(`count(1)` as bigint) as docs",
        "cast(`sum(n_tok)` as bigint) as total_tokens",
        "cast(`sum(tok_sum)` as bigint) as checksum",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from zseq import queries as Q

    return Q.queries()


def oracle_sql() -> dict[str, str]:
    from zseq import queries as Q

    return Q.oracle_sql()
