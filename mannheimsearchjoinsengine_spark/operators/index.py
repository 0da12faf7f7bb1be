"""Stage 2 — inverted index build (reference S8/S9).

The reference writes one Lucene document per cell with the ``value`` field
analyzed (``index/IndexManager.indexValue:239-272``); the Spark-native
equivalent is a token-posting DataFrame: explode each *distinct* normalized
subject into tokens and keep provenance. The attribute index
(``index/AttributesIndexManager.java:55-66``) becomes a small broadcastable
predicate table.

Scale design:
* postings are built from DISTINCT (subj_norm, conv_id) — the explode factor
  is bounded by tokens-per-label (~2-4), so the posting table is O(labels),
  not O(turns).
* document-frequency capping (``df_cap``) drops ultra-frequent tokens — the
  df-based stopwording the reference got implicitly from Lucene scoring;
  at 10^12-turn scale this is what keeps the probe join from degenerating
  on hot tokens (SURVEY.md §4 skew row).
* written partitioned/bucketed by token via the catalog layer so repeated
  probes co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mannheimsearchjoinsengine_spark.functions.normalize import norm_tokens


def build_postings(facts: DataFrame, df_cap: float = 0.5) -> DataFrame:
    """Token postings over distinct (subj_norm, conv_id) label occurrences.

    Returns (token, subj_norm, conv_id, n_rows) where n_rows is the label's
    multiplicity inside the conversation (≙ ``IndexEntry.valueMultiplicity``,
    ``model/IndexEntry.java:10-48``).

    ``df_cap``: tokens appearing in more than this fraction of all distinct
    labels are dropped (stopword-by-df; Lucene's idf made them weightless —
    ``index/IndexManager.searchIndex:290-458`` relied on that).
    """
    labels = facts.groupBy("subj_norm", "conv_id").agg(F.count("*").alias("n_rows"))
    postings = labels.select(
        F.explode(norm_tokens(F.col("subj_norm"))).alias("token"),
        "subj_norm",
        "conv_id",
        "n_rows",
    )
    if df_cap is not None:
        # the df-cap denominator (#distinct labels) is a 1-row aggregate
        # broadcast into the filter, NOT a driver-side .count() — a scalar
        # count action is an extra blocking job that re-runs the upstream
        # subtree; the broadcast-scalar crossJoin stays one lazy plan.
        #
        # Broadcast the HOT side, not the keep side: tokens above the df cap
        # are bounded by ~1/df_cap rows (each hot token covers > df_cap of
        # all labels, and coverages sum to tokens-per-label × n_labels), so
        # the broadcast stays a handful of rows at ANY vocabulary size. The
        # keep list is O(distinct tokens) ≈ O(vocabulary) — broadcasting it
        # would OOM at web scale. Same pattern as dedup.ngram_jaccard_pairs.
        n_labels = labels.agg(F.countDistinct("subj_norm").alias("n_labels"))
        hot = (
            postings.groupBy("token")
            .agg(F.countDistinct("subj_norm").alias("df_labels"))
            .crossJoin(F.broadcast(n_labels))
            .filter(F.col("df_labels") > F.floor(F.lit(df_cap) * F.col("n_labels")) + 1)
            .select("token")
        )
        postings = postings.join(F.broadcast(hot), "token", "left_anti")
    return postings


def token_stats(postings: DataFrame) -> DataFrame:
    """Per-token document frequency over labels + posting count (the idf
    source; integer-valued so it is oracle-exact)."""
    return postings.groupBy("token").agg(
        F.countDistinct("subj_norm").alias("df_labels"),
        F.countDistinct("conv_id").alias("df_convs"),
        F.count("*").alias("postings_cnt"),
    )


def build_attributes(cells: DataFrame) -> DataFrame:
    """S9 — attribute (predicate) index: one row per (conv_id, pred) with
    cardinality stats; broadcastable (≙ ``model/ColumnIndexEntry.java:5-36``)."""
    return cells.groupBy("conv_id", "pred_raw").agg(
        F.count("*").alias("card"),
        F.countDistinct("obj_raw").alias("n_distinct"),
    )
