"""Similarity search over an embedding column (array<float>).

Two paths:

  brute-force top-k   exact integer-quantized dot product of each query
                      against every row; one broadcast join + window
                      rank. The oracle-checkable baseline.
  LSH (random         sign-bit buckets from deterministic integer
  hyperplanes)        hyperplanes; candidates ranked within buckets. The
                      scale path: the full corpus is touched once to
                      bucket, queries probe only their bucket.

Determinism: embeddings are quantized with floor(x * 1000) to int64 before
any arithmetic, so scores are exact integers and Spark == DuckDB ==
numpy bit-for-bit (float summation order never matters). Hyperplane
coefficients come from a fixed integer formula, not an RNG.

Scale notes: brute force is O(Q x N) — fine for reranking, not retrieval.
The LSH bucket join shuffles on (bucket), bounded by bucket occupancy;
at 10^12 rows you'd raise SIM_BITS to keep buckets small and multi-probe
neighboring buckets for recall (probe count is the recall knob).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1000
SIM_BITS = 8


def bits_for(n_rows: int, target_occupancy: int = 64,
             lo: int = 3, hi: int = 30) -> int:
    """Hyperplane count sized from the corpus: 2^bits buckets targeting
    ~target_occupancy rows per bucket, clamped to [lo, hi]. This is the
    100x-scale knob the fixed SIM_BITS constant lacked: at 10^12 rows it
    yields 34->30 bits (capped), keeping the bucket join's per-key fan-in
    bounded instead of degenerating to 256 global buckets."""
    import math

    n = max(int(n_rows), 1)
    if n <= target_occupancy:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n / target_occupancy))))


def _qdot(a: str, b: str) -> str:
    """Spark SQL: exact integer dot product of two float arrays."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"cast(floor(cast(x as double) * {QUANT}) as bigint) * "
        f"cast(floor(cast(y as double) * {QUANT}) as bigint)), 0L, "
        f"(acc, v) -> acc + v)"
    )


def _qdot_duck(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), i -> "
        f"cast(floor(cast({a}[i] as double) * {QUANT}) as bigint) * "
        f"cast(floor(cast({b}[i] as double) * {QUANT}) as bigint)))"
    )


def brute_force_topk(df: DataFrame, n_queries: int = 10,
                     topk: int = 5, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Top-k neighbors (excluding self) for the first ``n_queries`` ids by
    quantized dot product; ties broken by neighbor id (deterministic)."""
    from pyspark.sql import Window

    q = df.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    joined = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    ).join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = joined.selectExpr(
        "query_id", "neighbor_id", _qdot("qv", "nv") + " as score")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .selectExpr("cast(query_id as bigint) as query_id",
                    "cast(neighbor_id as bigint) as neighbor_id",
                    "cast(score as bigint) as score",
                    "cast(rank as bigint) as rank")
    )


def brute_force_topk_oracle_sql(n_queries: int = 10, topk: int = 5,
                                table: str = "embeddings",
                                id_col: str = "vec_id",
                                vec_col: str = "embedding") -> str:
    dot = _qdot_duck("q.qv", "n.nv")
    return f"""
WITH q AS (SELECT {id_col} as query_id, {vec_col} as qv FROM {table}
           WHERE {id_col} < {n_queries}),
     n AS (SELECT {id_col} as neighbor_id, {vec_col} as nv FROM {table}),
     scored AS (
       SELECT q.query_id, n.neighbor_id, {dot} as score
       FROM q JOIN n ON n.neighbor_id != q.query_id),
     ranked AS (
       SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, neighbor_id ASC) as rank
       FROM scored)
SELECT cast(query_id as bigint) as query_id,
       cast(neighbor_id as bigint) as neighbor_id,
       cast(score as bigint) as score, cast(rank as bigint) as rank
FROM ranked WHERE rank <= {topk}
"""


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (deterministic integer hyperplanes)
# ---------------------------------------------------------------------------

def _hyperplane_coef(j: int, d: int) -> int:
    """Fixed pseudo-random small-integer coefficient for hyperplane j,
    dim d — pure formula, identical in any engine."""
    return ((j * 1315423911 + d * 2654435761 + 97) % 17) - 8


def bucket_expr(vec_col: str, dim: int, bits: int = SIM_BITS,
                dialect: str = "spark") -> str:
    """SQL expression computing the LSH bucket id (one sign bit per
    hyperplane) from the quantized embedding."""
    terms = []
    for j in range(bits):
        if dialect == "spark":
            dot = (
                f"aggregate(zip_with({vec_col}, "
                f"array({', '.join(str(_hyperplane_coef(j, d)) for d in range(dim))}), "
                f"(x, c) -> cast(floor(cast(x as double) * {QUANT}) as bigint) * c), "
                f"0L, (acc, v) -> acc + v)"
            )
            terms.append(
                f"(case when ({dot}) > 0 then shiftleft(1L, {j}) else 0L end)"
            )
        else:
            coefs = ", ".join(str(_hyperplane_coef(j, d)) for d in range(dim))
            dot = (
                f"list_sum(list_transform(range(1, {dim} + 1), i -> "
                f"cast(floor(cast({vec_col}[i] as double) * {QUANT}) as bigint) * "
                f"([{coefs}])[i]))"
            )
            terms.append(
                f"(case when ({dot}) > 0 then (1::bigint << {j}) "
                f"else 0 end)"
            )
    return "(" + " + ".join(terms) + ")"


def lsh_buckets(df: DataFrame, dim: int, bits: int = SIM_BITS,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    return df.selectExpr(
        f"cast({id_col} as bigint) as {id_col}",
        f"{bucket_expr(vec_col, dim, bits)} as bucket",
    )


def lsh_bucket_oracle_sql(dim: int, bits: int = SIM_BITS,
                          table: str = "embeddings",
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> str:
    return (
        f"SELECT cast({id_col} as bigint) as {id_col}, "
        f"{bucket_expr(vec_col, dim, bits, dialect='duckdb')} as bucket "
        f"FROM {table}"
    )


def _probe_masks(bits: int, probes: int) -> list[int]:
    """XOR masks of the probed buckets: home bucket, all Hamming-1 flips
    (probes >= 1), all Hamming-2 flips (probes >= 2). Masks are distinct,
    so each (query, neighbor) pair matches at most once. Probed-bucket
    count is 1 + bits + C(bits,2) at probes=2 — at corpus scale (bits
    ~20-30) that's a few hundred buckets of ~target_occupancy rows each,
    the standard multi-probe cost/recall trade."""
    masks = [0]
    if probes >= 1:
        masks += [1 << j for j in range(bits)]
    if probes >= 2:
        masks += [(1 << i) | (1 << j)
                  for i in range(bits) for j in range(i + 1, bits)]
    return masks


def lsh_topk(df: DataFrame, dim: int, n_queries: int = 10, topk: int = 5,
             bits: int | None = None, probes: int = 1,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN: rank by exact quantized dot product within the query's LSH
    bucket plus (probes >= 1) all Hamming-1 neighbor buckets. bits=None
    sizes the hyperplane count from the corpus (bits_for), so bucket
    occupancy stays bounded at any scale instead of being hostage to a
    global constant."""
    from pyspark.sql import Window

    if bits is None:
        bits = bits_for(df.count())
    b = df.selectExpr(
        f"cast({id_col} as bigint) as {id_col}", vec_col,
        f"{bucket_expr(vec_col, dim, bits)} as bucket")
    probe = ", ".join(
        f"cast(bucket ^ {m} as bigint)" for m in _probe_masks(bits, probes))
    q = b.filter(F.col(id_col) < n_queries).selectExpr(
        f"{id_col} as query_id", f"{vec_col} as qv",
        f"explode(array({probe})) as bucket")
    joined = b.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"),
        "bucket",
    ).join(F.broadcast(q), on="bucket").filter(
        F.col("neighbor_id") != F.col("query_id"))
    scored = joined.selectExpr(
        "query_id", "neighbor_id", _qdot("qv", "nv") + " as score")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .selectExpr("cast(query_id as bigint) as query_id",
                    "cast(neighbor_id as bigint) as neighbor_id",
                    "cast(score as bigint) as score",
                    "cast(rank as bigint) as rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer -> cell assignment -> probe
# ---------------------------------------------------------------------------

#: Inline the quantizer into a SQL expression only up to this many K*dim
#: terms. The cap is on K*dim, NOT K: the expression size (and Catalyst
#: analysis cost) scales with the literal count, so K=4096 at dim=64 is
#: fine (262144 terms, the testdata regime) while the SAME K at
#: production dims 768-1536 would be a multi-MB projection Catalyst
#: chokes on. Beyond the cap the broadcast-matrix path takes over.
IVF_MAX_INLINE_TERMS = 262_144

#: Hard cap on the quantizer's K*dim for the broadcast-matrix path:
#: 16M int64 terms = 128 MB of broadcast state per executor — the point
#: where "coarse quantizer as broadcast state" stops being coarse.
IVF_MAX_MATRIX_TERMS = 16_777_216


def _ivf_centroids(df: DataFrame, c_mod: int, id_col: str,
                   vec_col: str, dim: int) -> list[tuple[int, list[int]]]:
    """Deterministic coarse quantizer: the rows with id % c_mod == 0 are
    the centroids (k-means would need an RNG + iterations; a
    deterministic arithmetic pick keeps Spark == DuckDB == rerun exact,
    and on L2-normalized corpora random-ish picks are the standard
    kmeans init anyway). Returns [(cid, quantized ints)] sorted by cid —
    a DRIVER collect of K rows, which is the point: the coarse quantizer
    IS broadcast state in any IVF system. K*dim is hard-capped at
    IVF_MAX_MATRIX_TERMS (128 MB of broadcast int64s); beyond that raise
    c_mod (the error says so)."""
    import math

    rows = (
        # null / null-element vectors can never be centroids (they are
        # normalized to null and join no cell); a WRONG-DIM vector that
        # lands here still raises below — that's input validation, not
        # dirty data, and must stay loud.
        df.filter(f"{id_col} % {c_mod} = 0 and {vec_col} is not null "
                  f"and not exists({vec_col}, x -> x is null)")
        .selectExpr(f"cast({id_col} as bigint) as cid", vec_col)
        .collect()
    )
    if not rows:
        raise ValueError(
            f"ivf: no centroids (no {id_col} % {c_mod} == 0 rows) — "
            "lower c_mod")
    if len(rows) * dim > IVF_MAX_MATRIX_TERMS:
        raise ValueError(
            f"ivf: {len(rows)} centroids x dim {dim} exceed the "
            f"broadcast-state cap {IVF_MAX_MATRIX_TERMS} terms — raise "
            "c_mod (or pass c_mod=None to auto-size K ~ sqrt(N))")
    out = []
    for r in sorted(rows, key=lambda r: r["cid"]):
        if len(r[vec_col]) != dim:
            raise ValueError(
                f"ivf: centroid {r['cid']} has dim {len(r[vec_col])}, "
                f"expected {dim}")
        q = [int(math.floor(float(x) * QUANT)) for x in r[vec_col]]
        out.append((int(r["cid"]), q))
    return out


def _kmeans_refine(base: DataFrame, cents: list[tuple[int, list[int]]],
                   dim: int, vec_col: str, iters: int = 5,
                   inline_cap: int = IVF_MAX_INLINE_TERMS
                   ) -> list[tuple[int, list[int]]]:
    """Deterministic integer Lloyd refinement of the modular init:
    ``iters`` fixed rounds of (assign every row to its argmax-dot cell,
    ties to the smaller cid) -> (new centroid = floor of the component-
    wise integer mean of its members' QUANT-quantized vectors). All
    arithmetic is int64 — sums are associative/commutative EXACTLY, so
    the result is independent of Spark partitioning/scheduling and a
    rerun reproduces it bit-for-bit (the reason this is Lloyd-over-ints
    and not float k-means). Cell labels keep the init's cids; a cell
    that goes empty keeps its previous centroid (standard Lloyd).

    Cost: per round, one corpus scan for assignment (the same inline-
    codegen / broadcast-matrix split the query path uses) plus one
    map-side-combined aggregation whose shuffle is K*dim partial sums —
    bounded by the same IVF_MAX_MATRIX_TERMS cap as the quantizer
    itself, never corpus-sized."""
    qcols = [
        f"cast(floor(cast({vec_col}[{i}] as double) * {QUANT}) as bigint)"
        f" as q{i}"
        for i in range(dim)
    ]
    for _ in range(iters):
        assign1 = None
        if len(cents) * dim <= inline_cap:
            cells = _ivf_cell_structs(vec_col, cents)
            assigned = base.selectExpr(
                vec_col,
                f"case when {vec_col} is null then null "
                f"else -array_max({cells}).negc end as cid",
            ).filter("cid is not null")
        else:
            (assign1,) = _ivf_probe_udfs(base, cents, [1])
            assigned = base.withColumn(
                "cid", F.element_at(assign1(F.col(vec_col)), 1)
            ).filter("cid is not null")
        stats = (
            assigned.selectExpr("cid", *qcols)
            .groupBy("cid")
            .agg(F.count("*").alias("n"),
                 *[F.sum(f"q{i}").alias(f"s{i}") for i in range(dim)])
            .collect()
        )
        if assign1 is not None:
            # this round's centroid broadcast is dead once the stats
            # are collected — release it instead of accumulating one
            # ~128 MB blob per iteration
            bc = getattr(assign1, "_zseq_bc", None)
            if bc is not None:
                bc.unpersist(False)
        by_cid = {int(r["cid"]): r for r in stats}
        new: list[tuple[int, list[int]]] = []
        for cid, q in cents:
            r = by_cid.get(cid)
            if r is None or not r["n"]:
                new.append((cid, q))
            else:
                n = int(r["n"])
                # python floor division == floor for negatives too —
                # matches the floor-quantization convention everywhere
                new.append((cid, [int(r[f"s{i}"]) // n
                                  for i in range(dim)]))
        cents = new
    return cents


def _ivf_probe_udfs(df: DataFrame, cents: list[tuple[int, list[int]]],
                    ns: list[int]):
    """Vectorized (Arrow-batched) cell probers for quantizers too large
    to inline: the (K, dim) int64 centroid matrix is an explicit Spark
    BROADCAST (made ONCE and shared by every returned prober — at the
    16M-term cap a duplicate would double 128 MB of executor state), and
    each batch scores all K cells with one numpy matmul
    (batch x dim) @ (dim x K), then takes the top-``n`` cids per row —
    stable argsort on -score, so ties go to the smaller cid, exactly the
    inline path's struct-max/reverse-sort semantics. No per-row Python,
    no expression blow-up: Catalyst sees one opaque projection. Returns
    one pandas UDF per entry of ``ns``."""
    from pyspark.sql.functions import pandas_udf

    cids = np.array([c for c, _ in cents], dtype=np.int64)
    mat = np.array([q for _, q in cents], dtype=np.int64)
    bc = df.sparkSession.sparkContext.broadcast((cids, mat))

    def make(n: int):
        @pandas_udf("array<bigint>")
        def probe(vs: pd.Series) -> pd.Series:
            if len(vs) == 0:
                return pd.Series([], dtype=object)
            cids_, mat_ = bc.value
            # NULL / ragged vectors get a NULL probe list — they then
            # join no cell, exactly the inline path's degradation (its
            # null scores make explode/join drop the row). A raw
            # np.stack would instead fail the whole task on one bad row.
            out: list = [None] * len(vs)
            idxs, vecs = [], []
            for i, v in enumerate(vs):
                if v is None:
                    continue
                a = np.asarray(v, dtype=np.float64)
                if a.ndim != 1 or a.shape[0] != mat_.shape[1]:
                    continue
                idxs.append(i)
                vecs.append(a)
            if vecs:
                # Element quantization mirrors the inline SQL cast
                # (measured on this Spark, ANSI on): NaN -> 0,
                # +/-Inf -> int64 max/min. FINITE values past int64
                # RAISE, exactly like the inline path's ANSI cast would
                # — the two physical paths must be behaviorally
                # identical on every input, not just on the normalized
                # embeddings where overflow is unreachable (float32
                # embeddings stay ~1e18 away from the edge).
                scaled = np.floor(np.stack(vecs) * QUANT)
                finite = np.isfinite(scaled)
                over = finite & ((scaled > 9.223372036854774e18)
                                 | (scaled < -9.223372036854775e18))
                if over.any():
                    bad = float(scaled[over].flat[0]) / QUANT
                    raise ValueError(
                        "ivf probe: embedding value "
                        f"{bad!r} overflows int64 after x{QUANT} "
                        "quantization (the inline SQL path would raise "
                        "under ANSI too). Normalize embeddings before "
                        "indexing.")
                q = np.zeros(scaled.shape, dtype=np.int64)
                q[finite] = scaled[finite].astype(np.int64)
                q[scaled == np.inf] = np.iinfo(np.int64).max
                q[scaled == -np.inf] = np.iinfo(np.int64).min
                scores = q @ mat_.T               # (batch, K) exact int64
                if n == 1:
                    # O(K) first-max == smallest cid on ties (cid-sorted
                    # matrix) — this is the per-corpus-row hot path; the
                    # O(K log K) argsort is only paid by query rows.
                    tops = cids_[scores.argmax(axis=1)][:, None]
                else:
                    order = np.argsort(-scores, axis=1,
                                       kind="stable")[:, :n]
                    tops = cids_[order]
                for j, i in enumerate(idxs):
                    out[i] = tops[j]
            return pd.Series(out)

        return probe

    udfs = [make(n) for n in ns]
    for u in udfs:
        # expose the shared broadcast so iterative callers (the k-means
        # refiner builds fresh centroids each round) can unpersist it —
        # otherwise every Lloyd iteration pins up to 128 MB of dead
        # executor state for the application's lifetime
        u._zseq_bc = bc
    return udfs


def _ivf_cell_structs(vec_col: str,
                      cents: list[tuple[int, list[int]]]) -> str:
    """Spark SQL: array of (score, -cid) structs against every centroid —
    the per-row coarse scoring, fully inside whole-stage codegen, zero
    joins/shuffles. Struct comparison is lexicographic, so max == argmax
    with ties to the smaller cid."""
    structs = ", ".join(
        "struct(("
        f"aggregate(zip_with({vec_col}, "
        f"array({', '.join(f'{c}L' for c in q)}), "
        f"(x, c) -> cast(floor(cast(x as double) * {QUANT}) as bigint)"
        " * c), 0L, (acc, v) -> acc + v)"
        f") as s, {-cid}L as negc)"
        for cid, q in cents)
    return f"array({structs})"


def ivf_topk(df: DataFrame, dim: int, n_queries: int = 10, topk: int = 5,
             c_mod: int | None = 50, nprobe: int = 2,
             id_col: str = "vec_id",
             vec_col: str = "embedding",
             max_inline_terms: int | None = None,
             quantizer: str = "modular",
             kmeans_iters: int = 5) -> DataFrame:
    """IVF ANN: every corpus row is assigned to its nearest centroid's
    cell (argmax quantized dot, ties to the smaller cid); a query probes
    its ``nprobe`` best cells and is reranked exactly against only those
    cells' rows. ``c_mod=None`` auto-sizes the quantizer to K ~ sqrt(N)
    (the textbook IVF cell count) from a corpus count; ``dim`` is
    validated against the centroid vectors.

    Plan shape (the IVF scale story): cell assignment is a single
    PROJECTION, so the corpus is touched once with no join, no shuffle,
    and no per-row sort. Two physically different projections, same
    semantics: when K*dim <= IVF_MAX_INLINE_TERMS the centroid matrix is
    inlined into a codegen'd expression (O(K) array_max argmax); beyond
    that — production dims 768-1536 would otherwise blow Catalyst up on
    a multi-MB expression — the matrix rides an explicit broadcast and
    assignment is an Arrow-batched numpy matmul+argmax (_ivf_probe_udfs).
    Only the n_queries QUERY rows pay the top-nprobe sort. The probe
    join broadcasts (n_queries x nprobe) rows; one shuffle for the
    per-query rank window. Probing all cells (nprobe >= centroid count)
    degenerates to exact brute force — the recall knob is explicit.

    ``quantizer='kmeans'`` refines the modular pick with ``kmeans_iters``
    deterministic integer Lloyd rounds (:func:`_kmeans_refine`) — better
    recall / cell balance on CLUSTERED embeddings, identical determinism
    (all-int arithmetic; a rerun is bit-exact). The default stays
    'modular': reproducible without extra corpus scans, and the standard
    random-ish init on normalized corpora."""
    import math

    from pyspark.sql import Window

    if quantizer not in ("modular", "kmeans"):
        raise ValueError(
            f"ivf: unknown quantizer {quantizer!r} "
            "(one of 'modular', 'kmeans')")
    if c_mod is None:
        n = df.count()
        # K = N / c_mod ~ sqrt(N)  =>  c_mod ~ sqrt(N)
        c_mod = max(1, int(math.sqrt(max(n, 1))))
    cents = _ivf_centroids(df, c_mod, id_col, vec_col, dim)
    # A vector with a NULL ELEMENT or a WRONG LENGTH is normalized to a
    # NULL VECTOR before either path sees it: the inline SQL and the
    # Arrow UDF would otherwise diverge (zip_with propagates element
    # nulls into null scores and silently truncates ragged vectors with
    # engine-specific tie behavior, while Arrow->pandas folds element
    # nulls into NaN and the matrix prober can't score a short row).
    # Null vectors join no cell and drop out — one documented semantic,
    # identical on both paths.
    base = df.selectExpr(
        f"cast({id_col} as bigint) as {id_col}",
        f"case when exists({vec_col}, x -> x is null) "
        f"or size({vec_col}) != {dim} then null "
        f"else {vec_col} end as {vec_col}")
    inline_cap = (IVF_MAX_INLINE_TERMS if max_inline_terms is None
                  else max_inline_terms)
    if quantizer == "kmeans":
        cents = _kmeans_refine(base, cents, dim, vec_col,
                               iters=kmeans_iters, inline_cap=inline_cap)
    if len(cents) * dim <= inline_cap:
        cells = _ivf_cell_structs(vec_col, cents)
        # null vectors get a NULL cid / NULL probe list (they'd
        # otherwise be "assigned" by the all-null-score tie-break) —
        # mirrored by the matrix prober's None handling
        assigned = base.selectExpr(
            id_col, vec_col,
            f"case when {vec_col} is null then null "
            f"else -array_max({cells}).negc end as cid")
        q = (
            base.filter(f"{id_col} < {n_queries}")
            .selectExpr(
                f"{id_col} as query_id", f"{vec_col} as qv",
                f"explode(case when {vec_col} is null then null else "
                f"transform(slice(reverse(array_sort({cells})), "
                f"1, {nprobe}), p -> -p.negc) end) as cid")
        )
    else:
        assign1, proben = _ivf_probe_udfs(df, cents, [1, nprobe])
        assigned = base.withColumn(
            "cid", F.element_at(assign1(F.col(vec_col)), 1))
        q = (
            base.filter(f"{id_col} < {n_queries}")
            .select(F.col(id_col).alias("query_id"),
                    F.col(vec_col).alias("qv"),
                    F.explode(proben(F.col(vec_col))).alias("cid"))
        )
    joined = assigned.selectExpr(
        f"{id_col} as neighbor_id", f"{vec_col} as nv", "cid"
    ).join(F.broadcast(q), on="cid").filter(
        F.col("neighbor_id") != F.col("query_id"))
    scored = joined.selectExpr(
        "query_id", "neighbor_id", _qdot("qv", "nv") + " as score")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .selectExpr("cast(query_id as bigint) as query_id",
                    "cast(neighbor_id as bigint) as neighbor_id",
                    "cast(score as bigint) as score",
                    "cast(rank as bigint) as rank")
    )


def ivf_topk_oracle_sql(dim: int, n_queries: int = 10, topk: int = 5,
                        c_mod: int = 50, nprobe: int = 2,
                        table: str = "embeddings",
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> str:
    """Static SQL mirror: centroids re-derived from the same arithmetic
    rule, assignment/probing via window-rank argmax (same score-DESC,
    cid-ASC tiebreak), exact quantized rerank."""
    adot = _qdot_duck("b.v", "c.cv")
    sdot = _qdot_duck("qb.v", "nb.v")
    return f"""
WITH base AS (SELECT cast({id_col} as bigint) as id, {vec_col} as v
              FROM {table}),
     cents AS (SELECT id as cid, v as cv FROM base WHERE id % {c_mod} = 0),
     adots AS (SELECT b.id, c.cid, {adot} as s FROM base b, cents c),
     ranked_cells AS (
       SELECT id, cid, row_number() OVER (PARTITION BY id
              ORDER BY s DESC, cid ASC) as rn FROM adots),
     assign AS (SELECT id, cid FROM ranked_cells WHERE rn = 1),
     qprob AS (SELECT id as query_id, cid FROM ranked_cells
               WHERE id < {n_queries} AND rn <= {nprobe}),
     scored AS (
       SELECT q.query_id, a.id as neighbor_id, {sdot} as score
       FROM qprob q JOIN assign a USING (cid)
            JOIN base qb ON qb.id = q.query_id
            JOIN base nb ON nb.id = a.id
       WHERE a.id != q.query_id),
     ranked AS (
       SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, neighbor_id ASC) as rank
       FROM scored)
SELECT cast(query_id as bigint) as query_id,
       cast(neighbor_id as bigint) as neighbor_id,
       cast(score as bigint) as score, cast(rank as bigint) as rank
FROM ranked WHERE rank <= {topk}
"""


def ivf_topk_kmeans_oracle_sql(dim: int, n_queries: int = 10,
                               topk: int = 5, c_mod: int = 50,
                               nprobe: int = 2, iters: int = 5,
                               table: str = "embeddings",
                               id_col: str = "vec_id",
                               vec_col: str = "embedding") -> str:
    """Static SQL mirror of ``ivf_topk(quantizer='kmeans')``: the
    fixed-iteration integer Lloyd refinement (:func:`_kmeans_refine`) is
    UNROLLED as ``iters`` CTE layers — assignment by argmax integer dot
    (ties to the smaller cid), new centroid = component-wise floor-mean
    of the members' QUANT-quantized vectors, empty cells keep their
    previous centroid. All-int arithmetic makes the Spark result
    partitioning-independent, which is exactly what lets a sequential
    SQL engine reproduce it bit-for-bit. The floor-mean is computed as
    ``floor(s/n)`` in doubles: |s| <= rows*QUANT stays far under 2^53
    and the nearest non-integer true quotient is 1/n away from an
    integer, so double rounding cannot cross a floor boundary."""
    idot = (f"list_sum(list_transform(range(1, {dim} + 1), "
            "i -> b.qv[i] * c.cq[i]))")
    sdot = _qdot_duck("qr.v", "nb.v")
    layers = []
    for t in range(iters):
        layers.append(f"""
     a{t} AS (SELECT id, cid FROM (
       SELECT b.id, c.cid, row_number() OVER (PARTITION BY b.id
              ORDER BY {idot} DESC, c.cid ASC) as rn
       FROM qb b, c{t} c) WHERE rn = 1),
     n{t} AS (SELECT cid, count(*) as n FROM a{t} GROUP BY cid),
     m{t} AS (SELECT a.cid, e.i, sum(e.q) as s
              FROM a{t} a JOIN qe e USING (id) GROUP BY a.cid, e.i),
     u{t} AS (SELECT m.cid,
                     list(cast(floor(cast(m.s as double) / n.n) as bigint)
                          ORDER BY m.i) as cq
              FROM m{t} m JOIN n{t} n USING (cid) GROUP BY m.cid),
     c{t + 1} AS (SELECT c.cid, coalesce(u.cq, c.cq) as cq
                  FROM c{t} c LEFT JOIN u{t} u USING (cid))""")
    return f"""
WITH base AS (SELECT cast({id_col} as bigint) as id, {vec_col} as v
              FROM {table}),
     qb AS (SELECT id, list_transform(v, x ->
              cast(floor(cast(x as double) * {QUANT}) as bigint)) as qv
            FROM base),
     qe AS (SELECT id, i, qv[i] as q
            FROM qb, range(1, {dim} + 1) t(i)),
     c0 AS (SELECT id as cid, qv as cq FROM qb WHERE id % {c_mod} = 0),
     {",".join(layers)},
     adots AS (SELECT b.id, c.cid, {idot} as s FROM qb b, c{iters} c),
     ranked_cells AS (
       SELECT id, cid, row_number() OVER (PARTITION BY id
              ORDER BY s DESC, cid ASC) as rn FROM adots),
     assign AS (SELECT id, cid FROM ranked_cells WHERE rn = 1),
     qprob AS (SELECT id as query_id, cid FROM ranked_cells
               WHERE id < {n_queries} AND rn <= {nprobe}),
     scored AS (
       SELECT q.query_id, a.id as neighbor_id, {sdot} as score
       FROM qprob q JOIN assign a USING (cid)
            JOIN base qr ON qr.id = q.query_id
            JOIN base nb ON nb.id = a.id
       WHERE a.id != q.query_id),
     ranked AS (
       SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, neighbor_id ASC) as rank
       FROM scored)
SELECT cast(query_id as bigint) as query_id,
       cast(neighbor_id as bigint) as neighbor_id,
       cast(score as bigint) as score, cast(rank as bigint) as rank
FROM ranked WHERE rank <= {topk}
"""


def embedding_near_dups(df: DataFrame, dim: int, min_dot_q: int = 400_000,
                        bits: int | None = None, probes: int = 1,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Embedding near-duplicate pairs (the dedup brief's embedding-cosine
    family): pairs co-located in an LSH bucket (with Hamming multi-probe)
    whose exact quantized dot product >= min_dot_q. Embeddings are
    assumed L2-normalized, so the quantized dot IS cosine x QUANT^2 and
    the integer threshold is exact cross-engine.

    Scale shape: the corpus is bucketed once; the self-join shuffles on
    bucket with fan-out 1 + bits (+ C(bits,2) at probes=2) on the probe
    side, bounded by bucket occupancy (bits_for keeps that ~constant at
    any corpus size). Each qualifying pair appears exactly once: probe
    masks are distinct and the a<b filter keeps one orientation."""
    if bits is None:
        bits = bits_for(df.count())
    b = df.selectExpr(
        f"cast({id_col} as bigint) as {id_col}", vec_col,
        f"{bucket_expr(vec_col, dim, bits)} as bucket")
    probe = ", ".join(
        f"cast(bucket ^ {m} as bigint)" for m in _probe_masks(bits, probes))
    a = b.selectExpr(f"{id_col} as doc_a", f"{vec_col} as va",
                     f"explode(array({probe})) as bucket")
    bb = b.selectExpr(f"{id_col} as doc_b", f"{vec_col} as vb", "bucket")
    return (
        a.join(bb, on="bucket")
        .filter("doc_a < doc_b")
        .selectExpr("doc_a", "doc_b", _qdot("va", "vb") + " as dot")
        .filter(f"dot >= {min_dot_q}")
        .selectExpr("doc_a", "doc_b", "cast(dot as bigint) as dot")
    )


def embedding_near_dups_oracle_sql(dim: int, min_dot_q: int = 400_000,
                                   bits: int = SIM_BITS, probes: int = 1,
                                   table: str = "embeddings",
                                   id_col: str = "vec_id",
                                   vec_col: str = "embedding") -> str:
    bx = bucket_expr(vec_col, dim, bits, dialect="duckdb")
    dot = _qdot_duck("a.va", "bb.vb")
    probe_list = ", ".join(
        f"xor(bucket, {m})" for m in _probe_masks(bits, probes))
    return f"""
WITH b AS (SELECT cast({id_col} as bigint) as {id_col}, {vec_col},
                  {bx} as bucket FROM {table}),
     a AS (SELECT {id_col} as doc_a, {vec_col} as va,
                  unnest([{probe_list}]) as bucket FROM b),
     bb AS (SELECT {id_col} as doc_b, {vec_col} as vb, bucket FROM b),
     pairs AS (
       SELECT a.doc_a, bb.doc_b, {dot} as dot
       FROM a JOIN bb USING (bucket) WHERE a.doc_a < bb.doc_b)
SELECT doc_a, doc_b, cast(dot as bigint) as dot
FROM pairs WHERE dot >= {min_dot_q}
"""


def lsh_topk_oracle_sql(dim: int, n_queries: int = 10, topk: int = 5,
                        bits: int = SIM_BITS, probes: int = 1,
                        table: str = "embeddings",
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> str:
    bx = bucket_expr(vec_col, dim, bits, dialect="duckdb")
    dot = _qdot_duck("q.qv", "n.nv")
    probe_list = ", ".join(
        f"xor(bucket, {m})" for m in _probe_masks(bits, probes))
    return f"""
WITH b AS (SELECT cast({id_col} as bigint) as {id_col}, {vec_col},
                  {bx} as bucket FROM {table}),
     q AS (SELECT {id_col} as query_id, {vec_col} as qv,
                  unnest([{probe_list}]) as bucket FROM b
           WHERE {id_col} < {n_queries}),
     n AS (SELECT {id_col} as neighbor_id, {vec_col} as nv, bucket FROM b),
     scored AS (
       SELECT q.query_id, n.neighbor_id, {dot} as score
       FROM q JOIN n ON q.bucket = n.bucket
       WHERE n.neighbor_id != q.query_id),
     ranked AS (
       SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, neighbor_id ASC) as rank
       FROM scored)
SELECT cast(query_id as bigint) as query_id,
       cast(neighbor_id as bigint) as neighbor_id,
       cast(score as bigint) as score, cast(rank as bigint) as rank
FROM ranked WHERE rank <= {topk}
"""
