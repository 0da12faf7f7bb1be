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


def _py_hyperplane(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5]:
    md5("plane:dim") first 8 hex chars scaled — reproducible in any engine
    (the DuckDB oracle inlines the same constants)."""
    import hashlib

    h = int(hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()[:8], 16)
    return h / float(0xFFFFFFFF) - 0.5


def lsh_bucket(vec_col, n_planes: int, dim: int, plane_offset: int = 0):
    """Random-hyperplane signature (int bucket id) for a vector column.

    The hyperplane constants are baked in as a literal array and the dot
    product is one zip_with/aggregate fold — a fully-unrolled multiply-add
    chain (planes × dim terms) blows janino's 64 KB method limit. Elements
    are double-cast first so the fold is double×double in sequence — the
    exact arithmetic the DuckDB twin (list_dot_product over double lists)
    performs, keeping oracle buckets bit-identical."""
    dv = vec_col.cast("array<double>")
    sig = F.lit(0)
    for p in range(n_planes):
        arr = F.array(
            *[F.lit(_py_hyperplane(plane_offset + p, d)) for d in range(dim)]
        )
        dot = F.aggregate(
            F.zip_with(dv, arr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def duck_lsh_bucket(vec_expr: str, n_planes: int, dim: int, plane_offset: int = 0) -> str:
    """DuckDB twin of lsh_bucket: the hyperplane constants are computed in
    Python from the same md5 derivation and inlined as literal arrays, so
    the oracle reproduces the exact buckets (elements double-cast to match
    Spark's float×double promotion). The dot product is an EXPLICIT
    left-to-right list_reduce fold mirroring Spark's sequential
    zip_with/aggregate — not list_dot_product, whose summation order is
    unspecified and could flip a near-zero bucket bit under a future
    SIMD/pairwise implementation."""
    dv = f"list_transform({vec_expr}, x -> CAST(x AS DOUBLE))"
    terms = []
    for p in range(n_planes):
        arr = "[" + ", ".join(
            repr(_py_hyperplane(plane_offset + p, d)) for d in range(dim)
        ) + "]"
        prods = f"list_transform(generate_series(1, {dim}), i -> {dv}[i] * ({arr})[i])"
        dot = f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {prods}), (a, x) -> a + x)"
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _dist_sq(a, b):
    """Σ(x−y)² as a sequential double fold — the same op order the DuckDB
    oracle's list_transform(generate_series)+sum performs, so the rounded
    distances (and therefore probe/list selection) are engine-identical."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    quantizer: str = "sampled",
) -> DataFrame:
    """IVF-style ANN: a coarse quantizer partitions the corpus into
    ``n_lists`` inverted lists; each query probes its ``n_probe`` nearest
    centroids and scores only those lists.

    Quantizers: ``sampled`` (default) picks the ``n_lists`` corpus vectors
    with the smallest md5(vec_id) as centroids — fully deterministic and
    reproducible in the DuckDB oracle (FAISS-style sampled training, no
    Lloyd iterations); ``kmeans`` trains pyspark.ml KMeans (better list
    balance, pytest-recall-checked, not oracle-mirrorable).

    Scale shape: training is an offline sample job; assignment is one
    narrow pass; the probe is a hash join on list_id over a corpus
    partitioned/bucketed by list_id — probe cost drops from O(N·Q) to
    O(Q·N·n_probe/n_lists). Recall < 1 by construction; pytest measures it
    against brute force."""
    if quantizer == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        spark = emb.sparkSession
        with_feat = emb.withColumn("features", array_to_vector(F.col(vec_col)))
        model = KMeans(k=n_lists, seed=seed, maxIter=10).fit(with_feat)
        corpus = model.transform(with_feat).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            F.col("prediction").alias("list_id"),
        )
        cent = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            ["list_id", "centroid"],
        )
    else:
        w_h = Window.orderBy("h")
        cent = (
            emb.select(
                F.col(vec_col).cast("array<double>").alias("centroid"),
                F.md5(F.col(id_col).cast("string")).alias("h"),
            )
            .orderBy("h")
            .limit(n_lists)
            .withColumn("list_id", F.row_number().over(w_h) - 1)
            .select("list_id", "centroid")
        )
        assigned = (
            emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
            .crossJoin(F.broadcast(cent))
            .withColumn(
                "dist",
                F.round(_dist_sq(F.col("cv").cast("array<double>"), F.col("centroid")), 4),
            )
        )
        wa = Window.partitionBy("neighbor_id").orderBy(F.asc("dist"), F.asc("list_id"))
        corpus = (
            assigned.withColumn("rn", F.row_number().over(wa))
            .filter(F.col("rn") == 1)
            .select("neighbor_id", "cv", "list_id")
        )
    # query → n_probe nearest centroids (centroid table is tiny → broadcast)
    qdist = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .crossJoin(F.broadcast(cent))
        .withColumn(
            "dist",
            F.round(
                _dist_sq(F.col("qv").cast("array<double>"), F.col("centroid").cast("array<double>")),
                4,
            ),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("list_id"))
    probes = (
        qdist.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qv", "list_id")
    )
    scored = (
        F.broadcast(probes)
        .join(corpus, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("qv"), F.col("cv")), 4).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_tables: int = 4,
    planes_per_table: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table LSH ANN: ``n_tables`` independent hyperplane signatures;
    a corpus vector is a candidate when it shares the bucket of ANY table
    (standard multi-table LSH — one table's collision probability for a
    near neighbor is (1-θ/π)^planes, multiple tables OR them together).
    Recall < 1 by construction; pytest measures it against brute force.

    At scale: corpus bucketing is one narrow pass; each table's probe is a
    hash join on (table, bucket) — no all-pairs scan."""
    tables_c = []
    tables_q = []
    for t in range(n_tables):
        plane_base = t * planes_per_table
        b = lsh_bucket(F.col(vec_col), planes_per_table, dim, plane_offset=plane_base)
        tables_c.append(
            emb.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cv"),
                F.lit(t).alias("table_no"),
                b.alias("bucket"),
            )
        )
        tables_q.append(
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("qv"),
                F.lit(t).alias("table_no"),
                b.alias("bucket"),
            )
        )
    c = tables_c[0]
    for x in tables_c[1:]:
        c = c.union(x)
    q = tables_q[0]
    for x in tables_q[1:]:
        q = q.union(x)
    cand = (
        F.broadcast(q)
        .join(c, ["table_no", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(_cosine(F.col("qv"), F.col("cv")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
