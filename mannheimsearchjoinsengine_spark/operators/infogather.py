"""J9 — InfoGather holistic table augmentation (TSP over the table graph).

Reference: ``infogather/QueryProcessor.java:42-317`` drives the published
InfoGather operation (Yakout et al., "InfoGather: Entity Augmentation and
Attribute Discovery By Holistic Matching with Web Tables", SIGMOD 2012):

* Q1 ``GetSeedTables:94-187``: seed tables found by key-overlap against
  the key index (optionally intersected with the attribute index for
  augmentation-by-attribute), scored DMA = overlap /
  min(|query keys|, |table rows|).
* Q2 ``ComputeTSP:205-285``: preference vector β = DMA normalized to sum
  1 (Eq. 6), then TSP(v) = Σ_u β(u)·PPR_u(v) (Theorem 1) — the reference
  reads PRECOMPUTED personalized-PageRank vectors from a GraphChi/
  BerkeleyDB blob that is not part of the repo (the "missing jar"). By
  linearity, Σ_u β(u)·PPR_u is exactly the PageRank vector personalized
  on β itself, so the offline random walks re-express as ONE
  power iteration on the table-similarity graph:
      score_{t+1}(v) = (1-d)·β(v) + d·Σ_u w(u,v)·score_t(u)
  with the row-stochastic edge weights w and damping d (0.85). Each
  iteration is a shuffle of the edge list — the standard distributed
  PageRank shape; k is small (the walk mixes in a few hops).
* Q3 ``AggregateAndSelectValues:295-317``: candidate values for the
  requested attribute are aggregated per query key weighted by the
  holistic TSP score; the best-scoring value wins.

Transcript mapping: web table ≙ conversation, key column ≙ ``subj_norm``,
attribute ≙ ``pred_raw``. The table graph edges are shared-distinct-key
counts between conversations (the reference's offline graph builds edges
from the same key/attribute match evidence, ``infogather/preprocessing``).

Documented divergence: ``GetSeedTables:155-165`` re-creates the per-table
overlap map inside the per-key loop (``overlapCount.put(k, new HashMap)``
unconditionally), clobbering prior counts — every table's "overlap" ends
up 1 regardless of how many keys matched. That makes DMA degenerate to
1/min(...); this implementation computes the paper's overlap (distinct
matched keys) instead of replicating a bug in a subsystem the reference
cannot run (missing PPR blob).

Scale shape: the conversation self-join on ``subj_norm`` is df-capped
exactly like index tokens (hot subjects appear in > df_cap of all
conversations; bounded ≤ 1/df_cap rows, broadcast left_anti) so no hub
key quadratics; the power iteration materializes each score vector
(localCheckpoint; stage ledger on a cluster) so the plan stays k shallow
joins instead of an exponentially nested tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
ITERATIONS = 4


def conv_key_sets(facts: DataFrame) -> DataFrame:
    """Distinct (conv_id, subj_norm) — the key column of each
    conversation-table."""
    return facts.select("conv_id", "subj_norm").distinct()


def conv_graph(
    facts: DataFrame, df_cap: float = 0.5, keys: DataFrame | None = None
) -> DataFrame:
    """Row-stochastic similarity edges (src, dst, w) between conversations
    sharing subject keys; weight = shared-distinct-key count / out-degree.

    Subjects present in more than ``df_cap`` of all conversations are
    dropped from the pairing (broadcast hot-side left_anti — the bounded
    side, same pattern as ``index.build_postings``): a hub subject would
    otherwise pair O(n²) conversations while carrying no topical signal.

    ``keys``: pass a pre-materialized ``conv_key_sets(facts)`` when the
    caller consumes it elsewhere too (relevant_tsp does) — otherwise the
    extract subtree re-runs per consumer.
    """
    keys = conv_key_sets(facts) if keys is None else keys
    if df_cap is not None:
        n_convs = keys.agg(F.countDistinct("conv_id").alias("n_convs"))
        hot = (
            keys.groupBy("subj_norm")
            .agg(F.countDistinct("conv_id").alias("df"))
            .crossJoin(F.broadcast(n_convs))
            .filter(F.col("df") > F.floor(F.lit(df_cap) * F.col("n_convs")) + 1)
            .select("subj_norm")
        )
        keys = keys.join(F.broadcast(hot), "subj_norm", "left_anti")
    a = keys.select("subj_norm", F.col("conv_id").alias("src"))
    b = keys.select("subj_norm", F.col("conv_id").alias("dst"))
    shared = (
        a.join(b, "subj_norm")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("shared"))
    )
    deg = shared.groupBy("src").agg(F.sum("shared").alias("out_w"))
    return shared.join(deg, "src").select(
        "src", "dst", (F.col("shared") / F.col("out_w")).alias("w")
    )


def dma_seeds(
    facts: DataFrame,
    query_keys: DataFrame,
    attribute: str | None = None,
    keys: DataFrame | None = None,
) -> DataFrame:
    """Q1: (conv_id, beta) — DMA = |matched distinct query keys| /
    min(|query keys|, |conversation fact rows|), restricted to
    conversations carrying ``attribute`` when given, normalized to sum 1
    (Eq. 6). ``query_keys``: one ``subj_norm`` per row."""
    qk = query_keys.select("subj_norm").distinct()
    keys = conv_key_sets(facts) if keys is None else keys
    matched = keys.join(qk, "subj_norm")
    if attribute is not None:
        with_attr = (
            facts.filter(F.col("pred_raw") == attribute).select("conv_id").distinct()
        )
        matched = matched.join(with_attr, "conv_id", "left_semi")
    overlap = matched.groupBy("conv_id").agg(
        F.countDistinct("subj_norm").alias("overlap")
    )
    conv_rows = facts.groupBy("conv_id").agg(F.count("*").alias("n_rows"))
    n_q = qk.agg(F.count("*").alias("n_q"))
    dma = (
        overlap.join(conv_rows, "conv_id")
        .crossJoin(F.broadcast(n_q))
        .select(
            "conv_id",
            (F.col("overlap") / F.least("n_q", "n_rows")).alias("dma"),
        )
    )
    total = dma.agg(F.sum("dma").alias("total"))
    return dma.crossJoin(F.broadcast(total)).select(
        "conv_id", (F.col("dma") / F.col("total")).alias("beta")
    )


def tsp_scores(
    edges: DataFrame,
    beta: DataFrame,
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
) -> DataFrame:
    """Q2: topic-sensitive PageRank personalized on β, by power iteration —
    returns (conv_id, tsp) for every node of the graph ∪ seed set. Each
    iteration materializes (localCheckpoint) so the lineage stays k
    shallow edge-joins."""
    nodes = (
        edges.select(F.col("src").alias("conv_id"))
        .union(edges.select(F.col("dst").alias("conv_id")))
        .union(beta.select("conv_id"))
        .distinct()
        .localCheckpoint()
    )
    base = nodes.join(beta, "conv_id", "left").select(
        "conv_id", F.coalesce("beta", F.lit(0.0)).alias("beta")
    ).localCheckpoint()
    score = base.select("conv_id", F.col("beta").alias("score"))
    for i in range(iterations):
        inflow = (
            edges.join(score.withColumnRenamed("conv_id", "src"), "src")
            .groupBy(F.col("dst").alias("conv_id"))
            .agg(F.sum(F.col("w") * F.col("score")).alias("acc"))
        )
        score = base.join(inflow, "conv_id", "left").select(
            "conv_id",
            (
                (1.0 - damping) * F.col("beta")
                + damping * F.coalesce("acc", F.lit(0.0))
            ).alias("score"),
        )
        # Materialize every SECOND iteration (and the last): a 2-deep
        # lineage (two edge-joins + aggs) plans fine, and each skipped
        # materialization saves a whole job — the per-job overhead is the
        # dominant cost of the iteration loop at the small-SF end, and at
        # cluster scale fewer ledger writes of an all-nodes vector.
        if i % 2 == 1 or i == iterations - 1:
            score = score.localCheckpoint()
    return score.select("conv_id", F.col("score").alias("tsp"))


def relevant_tsp(
    facts: DataFrame,
    query_keys: DataFrame,
    attribute: str | None = None,
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
    df_cap: float = 0.5,
) -> DataFrame:
    """Seed → graph → TSP, filtered to the RELEVANT conversations (≥ 1 key
    overlapping the query table, ``GetSeedTables:128-131``) — the only
    ones Q3 can use. Returns (conv_id, tsp).

    Plan shape: the key-set and edge tables feed several consumers (graph
    build, seeding, relevance filter, and every power iteration), so both
    are materialized ONCE (localCheckpoint; stage ledger on a cluster) —
    an all-lazy tree re-ran the extract + self-join subtree per iteration
    (measured 63 s → 13 s at sf0.1; the remainder is the unavoidable
    extract scans for row counts / attribute filtering, which the
    pipeline's ledger would serve from the cells stage)."""
    keys = conv_key_sets(facts).localCheckpoint()
    edges = conv_graph(facts, df_cap=df_cap, keys=keys).localCheckpoint()
    beta = dma_seeds(facts, query_keys, attribute, keys=keys)
    tsp = tsp_scores(edges, beta, damping, iterations)
    relevant = (
        keys.join(query_keys.select("subj_norm").distinct(), "subj_norm")
        .select("conv_id")
        .distinct()
    )
    return tsp.join(relevant, "conv_id", "left_semi")


def augment_by_attribute(
    facts: DataFrame,
    query_keys: DataFrame,
    attribute: str,
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
    df_cap: float = 0.5,
) -> DataFrame:
    """Q3 augmentation-by-attribute: for each query key, candidate values
    of ``attribute`` from the relevant conversations are scored by the
    summed TSP of the conversations asserting them; the best value wins
    (score desc, value asc — deterministic stand-in for the reference's
    fuser ordering). Returns (subj_norm, obj_raw, score)."""
    from pyspark.sql import Window

    tsp = relevant_tsp(
        facts, query_keys, attribute, damping, iterations, df_cap
    )
    cand = (
        facts.filter(F.col("pred_raw") == attribute)
        .join(query_keys.select("subj_norm").distinct(), "subj_norm")
        .select("conv_id", "subj_norm", "obj_raw")
        .distinct()
        .join(tsp, "conv_id")
        .groupBy("subj_norm", "obj_raw")
        # rank on the ROUNDED score: two engines summing the same floats in
        # different orders drift in the last bits, and a rank must never
        # hinge on that drift
        .agg(F.round(F.sum("tsp"), 6).alias("score"))
    )
    w = Window.partitionBy("subj_norm").orderBy(F.desc("score"), F.asc("obj_raw"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("subj_norm", "obj_raw", "score")
    )
