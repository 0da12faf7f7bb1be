"""LSH bucket-size guard: a degenerate band bucket (identical signatures)
must not emit k² candidate pairs — oversized buckets are dropped from the
pairing and surfaced as loud metrics rows (canonical.lsh_hot_buckets), and
normal corpora are unaffected (guarded output == unguarded output)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mannheimsearchjoinsengine_spark.operators import dedup
from mannheimsearchjoinsengine_spark.operators.canonical import (
    lsh_hot_buckets,
    minhash_candidate_pairs,
    minhash_signatures,
)


def _adversarial_docs(spark, n_dup=30, n_normal=6):
    """n_dup documents with IDENTICAL text (one signature -> every band
    bucket degenerates to size n_dup) plus a few distinct documents."""
    boiler = "terms of service apply to all users of this web site today"
    rows = [Row(doc_id=f"dup{i:03d}", text=boiler) for i in range(n_dup)]
    for i in range(n_normal):
        rows.append(
            Row(
                doc_id=f"ok{i:03d}",
                text=f"unique document number {i} about topic {i} with words "
                f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}",
            )
        )
    return spark.createDataFrame(rows)


def test_minhash_lsh_degenerate_bucket_bounded(spark):
    docs = _adversarial_docs(spark, n_dup=30)
    # unguarded: the 30 identical docs emit C(30,2) = 435 verified pairs
    raw = dedup.minhash_lsh_pairs(docs, max_bucket=None)
    assert raw.filter(F.col("doc1").startswith("dup")).count() == 435
    # guarded at 10: every band bucket holding the 30 clones is > cap ->
    # dropped, so no candidate (hence no output) pair among them
    capped = dedup.minhash_lsh_pairs(docs, max_bucket=10)
    assert capped.filter(F.col("doc1").startswith("dup")).count() == 0


def test_minhash_lsh_hot_bucket_metrics_rows(spark):
    docs = _adversarial_docs(spark, n_dup=30)
    sets = dedup._token_sets(docs, "text", "doc_id", 3)
    hot = lsh_hot_buckets(dedup.minhash_bands(sets), max_bucket=10).collect()
    # all 4 bands hold the same 30-clone bucket -> 4 loud rows of size 30
    assert len(hot) == 4
    assert all(r.n_members == 30 for r in hot)


def test_minhash_candidate_pairs_guard_and_parity(spark):
    # Distinct labels sharing one TOKEN SET (word-order permutations) get
    # identical minhash signatures -> one degenerate 20-row band bucket.
    base_words = ["acme", "corporation", "global", "holdings"]
    import itertools

    perms = ["".join(w + " " for w in p).strip()
             for p in itertools.permutations(base_words)][:20]
    df = spark.createDataFrame(
        [Row(subj_norm=s) for s in perms]
        + [Row(subj_norm=f"unrelated label {i}") for i in range(5)]
    )
    raw = minhash_candidate_pairs(df, max_bucket=None)
    # 20 permutations share the token set -> same signature -> C(20,2) pairs
    n_clone_pairs = raw.filter(
        F.col("left_key").contains("acme") & F.col("right_key").contains("acme")
    ).count()
    assert n_clone_pairs == 190
    capped = minhash_candidate_pairs(df, max_bucket=10)
    assert (
        capped.filter(
            F.col("left_key").contains("acme") & F.col("right_key").contains("acme")
        ).count()
        == 0
    )
    # sanity: signatures really are identical across permutations
    sigs = minhash_signatures(df.filter(F.col("subj_norm").contains("acme")))
    assert sigs.select("sig_0").distinct().count() == 1


def test_guard_no_op_on_normal_corpus(spark):
    # a normal corpus never hits the default cap: guarded == unguarded
    docs = spark.createDataFrame(
        [
            Row(doc_id=f"d{i}", text=f"document {i % 4} talks about subject "
                f"{i % 3} and mentions entity {i} plus shared boilerplate tail")
            for i in range(40)
        ]
    )
    cols = ["doc1", "doc2", "jaccard"]
    a = sorted(dedup.minhash_lsh_pairs(docs).select(cols).collect())
    b = sorted(dedup.minhash_lsh_pairs(docs, max_bucket=None).select(cols).collect())
    assert a == b


def test_embedding_auto_planes_matches_explicit(spark, sf_dir):
    """planes_per_table=None sizes p from the measured corpus count:
    p = clamp(2, ceil(log2(N/target_bucket)), 24) — pinned by equality
    with the explicit-p run at two targets."""
    from mannheimsearchjoinsengine_spark.sources.transcripts import load_table

    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint()
    n = emb.count()
    import math

    def rows(df):
        return sorted((r.id1, r.id2, r.cosine) for r in df.collect())

    # huge target -> clamped to the floor p=2
    auto_floor = dedup.embedding_near_dup_pairs(
        emb, tau=0.35, planes_per_table=None, target_bucket=10 * n
    )
    explicit2 = dedup.embedding_near_dup_pairs(emb, tau=0.35, planes_per_table=2)
    assert rows(auto_floor) == rows(explicit2)
    # a target that lands on a mid-range p
    target = max(1, n // 16)
    p = max(2, min(24, math.ceil(math.log2(max(n, 2) / target))))
    auto_mid = dedup.embedding_near_dup_pairs(
        emb, tau=0.35, planes_per_table=None, target_bucket=target
    )
    explicit_p = dedup.embedding_near_dup_pairs(emb, tau=0.35, planes_per_table=p)
    assert rows(auto_mid) == rows(explicit_p)
