"""Stage 4a — schema (predicate) consolidation.

Reference parity: instance-based duplicate-column detection —
``schemamatching/instance/InstanceBasedColumnComparer.compareColumns:76-206``
accumulates per-aligned-row scores into ``ColumnScoreValue``
(``model/schema/ColumnScoreValue.java:8-17,80-120``); the greedy marriage
decision is ``schemamatching/Matcher.decideCombinedObjectMatching:515-713``.

Spark-native: predicates are duplicate candidates when they assert the same
(subject, object) pairs. One self-join on the (subj,obj) evidence +
jaccard over distinct-pair sets — the reference's "short-circuit on
different dtype" blocking predicate (``InstanceBasedMatcher.java:99-107``)
becomes a cheap equality filter on majority dtype before scoring.

Scale: evidence is first deduped to distinct (pred, subj, obj) triples and
aggregated; the self-join keys on (subj_norm, obj_raw) — entity-name keys
with bounded multiplicity (≤ #predicates per subject), so no skew salting is
needed here; AQE covers stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def evidence(cells: DataFrame) -> DataFrame:
    """Distinct (pred, subj, obj) evidence, materialized once — it feeds
    several branches (sizes, both self-join sides, the all-preds set) and
    is schema×entity-sized (tiny) after the one corpus-wide distinct."""
    return cells.select("pred_raw", "subj_norm", "obj_raw").distinct().localCheckpoint()


def pred_pair_scores(cells: DataFrame, ev: DataFrame | None = None) -> DataFrame:
    """A3 — per predicate pair: shared distinct (subj,obj) evidence count +
    jaccard of pair-sets. Only pairs sharing ≥1 (subj,obj) are generated."""
    ev = evidence(cells) if ev is None else ev
    sizes = ev.groupBy("pred_raw").agg(F.count("*").alias("n_pairs"))
    e1 = ev.select(
        F.col("pred_raw").alias("pred1"), "subj_norm", "obj_raw"
    )
    e2 = ev.select(
        F.col("pred_raw").alias("pred2"), "subj_norm", "obj_raw"
    )
    shared = (
        e1.join(e2, ["subj_norm", "obj_raw"])
        .filter(F.col("pred1") < F.col("pred2"))
        .groupBy("pred1", "pred2")
        .agg(F.count("*").alias("shared"))
    )
    s1 = sizes.select(F.col("pred_raw").alias("pred1"), F.col("n_pairs").alias("n1"))
    s2 = sizes.select(F.col("pred_raw").alias("pred2"), F.col("n_pairs").alias("n2"))
    return (
        shared.join(F.broadcast(s1), "pred1")
        .join(F.broadcast(s2), "pred2")
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared")), 4),
        )
        .withColumn(
            "containment",
            F.round(F.col("shared") / F.least(F.col("n1"), F.col("n2")), 4),
        )
        .select("pred1", "pred2", "shared", "n1", "n2", "jaccard", "containment")
    )


def pred_merge_map(cells: DataFrame, tau: float = 0.7, min_shared: int = 2) -> DataFrame:
    """W4 — decide merges and emit pred → canonical_pred.

    A pair merges when containment (shared / smaller pair-set) ≥ τ and
    shared evidence ≥ min_shared. Containment rather than jaccard because a
    rarely-emitted synonym's evidence is a *subset* of its partner's
    (threshold kin of ``data.duplicates.instance*``,
    ``searchJoins.conf:79-97``).
    Canonical representative = the predicate with more evidence (tie →
    lexicographic min) — the reference's greedy marriage keeps the
    higher-scoring column (``Matcher.java:515-713``); synonym clusters here
    are star-shaped so one greedy pass suffices.

    Output has one row per predicate (identity rows included) so downstream
    can plain-join on pred_raw.
    """
    ev = evidence(cells)
    scores = pred_pair_scores(cells, ev).localCheckpoint().filter(
        (F.col("containment") >= tau) & (F.col("shared") >= min_shared)
    )
    edges = scores.select(
        "pred1",
        "pred2",
        F.when(
            (F.col("n1") > F.col("n2"))
            | ((F.col("n1") == F.col("n2")) & (F.col("pred1") < F.col("pred2"))),
            F.col("pred1"),
        )
        .otherwise(F.col("pred2"))
        .alias("winner"),
    )
    mapping = (
        edges.select(
            F.when(F.col("winner") == F.col("pred1"), F.col("pred2"))
            .otherwise(F.col("pred1"))
            .alias("pred_raw"),
            F.col("winner").alias("pred_canon"),
        )
        # a loser matched to several winners → deterministic min winner
        .groupBy("pred_raw")
        .agg(F.min("pred_canon").alias("pred_canon"))
    )
    # derive from the materialized evidence — not another full-corpus pass
    all_preds = ev.select("pred_raw").distinct()
    return (
        all_preds.join(mapping, "pred_raw", "left")
        .select(
            "pred_raw",
            F.coalesce("pred_canon", "pred_raw").alias("pred_canon"),
        )
    )


def apply_pred_merge(cells: DataFrame, merge_map: DataFrame) -> DataFrame:
    """Rewrite cells onto canonical predicates (broadcast map join)."""
    return cells.join(F.broadcast(merge_map), "pred_raw").withColumn(
        "pred_canon", F.col("pred_canon")
    )


def label_pair_scores(cells: DataFrame, max_lev: int = 3) -> DataFrame:
    """F2/W4 — label-based duplicate detection: predicate-name similarity by
    Levenshtein distance (``schemamatching/label/LabelBasedComparer.
    matchTwoLists:326-336``; the WordNet layers F7/F8 are optional plug-ins
    the reference ships disabled, ``searchJoins.conf:67-69``).

    sim = 1 − lev/max(len) (the classic normalized edit similarity). The
    candidate space is the distinct-predicate set — schema-sized, i.e. tiny
    versus the data, so the pair generation is a broadcast self-join; at a
    genuinely huge schema the prefix-bucket blocking used for labels in
    fuzzy.py applies verbatim.
    """
    preds = cells.select("pred_raw").distinct()
    p1 = preds.select(F.col("pred_raw").alias("pred1"))
    p2 = preds.select(F.col("pred_raw").alias("pred2"))
    pairs = p1.join(F.broadcast(p2), F.col("pred1") < F.col("pred2"))
    lev = F.levenshtein(F.col("pred1"), F.col("pred2"))
    return (
        pairs.withColumn("lev", lev)
        .filter(F.col("lev") <= max_lev)
        .withColumn(
            "label_sim",
            F.round(
                1 - F.col("lev") / F.greatest(F.length("pred1"), F.length("pred2")), 4
            ),
        )
    )
