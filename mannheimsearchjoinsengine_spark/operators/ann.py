"""Approximate nearest-neighbor search over an embedding column.

Task-mandated add-on: brute-force cosine top-k as the correctness baseline,
plus a random-hyperplane LSH-bucketed variant as the 100 TB scale path
(candidates only within matching hash buckets; probe cost drops from
O(N·Q) to O(Q·bucket)). Hyperplanes are derived deterministically from md5
of (plane index, dimension) → reproducible without RNG state.

Dot products are native ``zip_with``/``aggregate`` expressions (JVM,
codegen) — no Python in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(v1, v2):
    dot = F.aggregate(F.zip_with(v1, v2, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    n1 = F.sqrt(F.aggregate(v1, F.lit(0.0), lambda a, x: a + x * x))
    n2 = F.sqrt(F.aggregate(v2, F.lit(0.0), lambda a, x: a + x * x))
    return dot / (n1 * n2)


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    `queries`: (query_id, embedding). The query side is broadcast (queries ≪
    corpus); the corpus scan is one pass, ranked per query. Ties break on
    neighbor id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("qv"), F.col("cv")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplane(plane: int, dim: int):
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5]:
    md5("p:d") first 8 hex chars scaled. Same formula is reproducible in
    the pytest recall checks."""
    h = F.conv(F.substring(F.md5(F.lit(f"{plane}:{dim}")), 1, 8), 16, 10).cast("double")
    return h / F.lit(float(0xFFFFFFFF)) - 0.5


def lsh_bucket(vec_col, n_planes: int, dim: int):
    """Random-hyperplane signature (int bucket id) for a vector column."""
    sig = F.lit(0)
    for p in range(n_planes):
        dot = F.lit(0.0)
        for d in range(dim):
            dot = dot + F.element_at(vec_col, d + 1) * _hyperplane(p, d)
        sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: rank only within the query's hyperplane bucket.
    Recall < 1 by construction; pytest measures it against brute force."""
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("qv"), F.col("cv")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
