"""Deduplication operators for training-data pipelines over `documents`.

Task-mandated add-ons beyond the reference inventory: exact dedup,
MinHash+LSH near-dup, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Design for 100 TB:
* exact: one hash-groupBy on a 32-byte digest — partial agg map-side.
* n-gram jaccard: shingle-block join; the shingle explode is the cost and
  hot shingles are df-capped like index tokens.
* MinHash+LSH: signatures via md5 (engine-reproducible), banded buckets →
  candidate pairs only within buckets → exact verify. Candidates per bucket
  are bounded; no all-pairs blowup.
* SimHash: signature from per-token md5 bits — near-dups share a
  signature or differ in ≤ hamming_max bits. The driver oracle uses the
  16-bit demo width (keeps the SQL twin tractable); the 64-bit production
  width runs under the same scheme and is refimpl-pinned in
  tests/test_dedup_wide.py, as is MinHash at 64 hashes / 16 bands of 4
  (band-threshold knee ≈ 0.5, matched to the default tau).
* embedding cosine: brute-force pair join at test scale; the LSH-bucketed
  scale path lives in ann.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mannheimsearchjoinsengine_spark.functions.text import fingerprint
from mannheimsearchjoinsengine_spark.operators.canonical import (
    LSH_MAX_BUCKET,
    lsh_hot_buckets,
)


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by normalized-text fingerprint: one row per
    group with the keeper (min id) and the duplicate count."""
    fp = docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    return fp.groupBy("fp").agg(
        F.min(id_col).alias("keeper_id"),
        F.count("*").alias("n_docs"),
    )


def _tokens(text_col: str):
    """Whitespace token array of the lowercased text (empties dropped)."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != F.lit("")
    )


def _shingles_of(tk, n: int):
    """Word n-gram shingle array over an ALREADY-PROJECTED token-array
    column (n=1 → the column itself).

    ``tk`` must be a plain column reference, never the tokenizer
    expression: a lambda body re-evaluates every captured expression PER
    ELEMENT, so ``slice(<split chain>, i, n)`` inside the transform
    re-tokenized the whole document once per shingle position — measured
    3.2 s → 0.5 s at sf0.1 for the shingle explode alone after projecting
    the token array first (guide §4.1: HOF lambdas are interpreted, keep
    their bodies cheap)."""
    if n == 1:
        return tk
    # shingles: join n consecutive tokens; sequence + slice, all native.
    # Guard: sequence(1, 0) would DESCEND in Spark — short docs get [].
    return F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.array_join(F.slice(tk, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _token_sets(docs: DataFrame, text_col: str, id_col: str, n: int = 1) -> DataFrame:
    """Distinct word n-gram shingles per doc (n=1 → token set)."""
    toked = docs.select(F.col(id_col).alias("doc"), _tokens(text_col).alias("tk"))
    return (
        toked.select("doc", F.explode(_shingles_of(F.col("tk"), n)).alias("shingle"))
        .distinct()
    )


def _doc_profiles(
    docs: DataFrame, text_col: str, id_col: str, n: int, sig_hashes: int = 0
) -> DataFrame:
    """One row per doc: the distinct shingle set as an ARRAY (`sh`,
    element order unspecified — consumers must be order-free), its size
    `n_sh`, and optionally the minhash signature mins `sig_0..`.

    ONE groupBy(doc) exchange (collect_set partial-aggregates map-side)
    replaces the old shape's distinct-exchange on (doc, shingle) PLUS a
    per-consumer join/aggregate of the exploded set table — the verify
    stage then intersects the two member arrays per candidate pair
    (`size(array_intersect(...))` — exact: both arrays are distinct
    element sets) instead of shuffling/broadcasting the full exploded
    table twice. Same per-pair work, none of the set-table movement."""
    toked = docs.select(F.col(id_col).alias("doc"), _tokens(text_col).alias("tk"))
    raw = toked.select("doc", F.explode(_shingles_of(F.col("tk"), n)).alias("shingle"))
    aggs = [F.collect_set("shingle").alias("sh")]
    aggs += [
        F.min(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle"))), 1, 16)
        ).alias(f"sig_{j}")
        for j in range(sig_hashes)
    ]
    return raw.groupBy("doc").agg(*aggs).withColumn("n_sh", F.size("sh"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    top_pairs: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: float | None = 0.5,
) -> DataFrame:
    """Top near-dup pairs by word-n-gram Jaccard (F1 analog at doc scale;
    char n-gram variant of ``InstanceBasedComparer.java:553-560`` is in
    functions/similarity.py). Deterministic top-N by (jaccard desc, ids).
    ``sets`` feeds three branches → materialize once (see minhash note).

    Scale shape: the blocking self-join runs only over shingles whose
    document frequency is ≤ ``floor(df_cap · n_docs) + 1`` (same formula as
    ``index.build_postings``) — a boilerplate shingle shared by k docs would
    otherwise emit k² candidate rows. The hot-shingle list is tiny, so it is
    broadcast into a left-anti join (NOT the huge keep-list). Shared counts
    come from the SAME blocking join (no second full-sets pass); the hot
    shingles' contribution is added back per candidate pair from the tiny
    (doc, hot-shingle) table, so scores stay EXACT jaccard over the full
    sets while the cap affects recall only (pairs sharing nothing but hot
    shingles are missed — by design, those are boilerplate).
    ``df_cap=None`` restores the exhaustive join (tests/recall oracle).

    (r06 A/B note: an array-intersect verify over per-doc shingle arrays —
    the shape that pays off in minhash_lsh_pairs — was measured 0.74x HERE
    and reverted: with no tau pre-filter every blocked candidate pair ships
    two full shingle arrays to the verify join, while this shape gets the
    shared counts for free from the blocking join's aggregate.)"""
    sets = _token_sets(docs, text_col, id_col, n).localCheckpoint()
    blocked, hot = sets, None
    if df_cap is not None:
        # broadcast-scalar denominator (no driver .count()), same pattern as
        # index.build_postings:48-62
        n_docs = sets.agg(F.countDistinct("doc").alias("n_docs"))
        hot = (
            sets.groupBy("shingle")
            .agg(F.count("*").alias("df_docs"))  # sets is distinct per (doc, shingle)
            .crossJoin(F.broadcast(n_docs))
            .filter(F.col("df_docs") > F.floor(F.lit(df_cap) * F.col("n_docs")) + 1)
            .select("shingle")
        )
        blocked = sets.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sets.groupBy("doc").agg(F.count("*").alias("n_sh"))
    ca = blocked.select(F.col("doc").alias("doc1"), "shingle")
    cb = blocked.select(F.col("doc").alias("doc2"), "shingle")
    shared = (
        ca.join(cb, "shingle")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("shared"))
    )
    if hot is not None:
        # add the hot shingles shared by each CANDIDATE pair (exact scores
        # without re-joining the full sets): hot_sets is (few hot shingles ×
        # their docs) — broadcast-scale by construction of the cap
        hot_sets = sets.join(F.broadcast(hot), "shingle")
        h1 = hot_sets.select(F.col("doc").alias("doc1"), "shingle")
        h2 = hot_sets.select(F.col("doc").alias("doc2"), "shingle")
        shared_hot = (
            shared.select("doc1", "doc2")
            .join(h1, "doc1")
            .join(h2, ["doc2", "shingle"])
            .groupBy("doc1", "doc2")
            .agg(F.count("*").alias("shared_hot"))
        )
        shared = (
            shared.join(shared_hot, ["doc1", "doc2"], "left")
            .withColumn(
                "shared", F.col("shared") + F.coalesce(F.col("shared_hot"), F.lit(0))
            )
            .drop("shared_hot")
        )
    s1 = sizes.select(F.col("doc").alias("doc1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col("doc").alias("doc2"), F.col("n_sh").alias("n2"))
    jac = (
        shared.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared")), 4),
        )
    )
    # TakeOrdered top-N (parallel partial top-k per partition, merged on the
    # driver), NOT a global row_number window — the un-partitioned window
    # sorted ALL pairs through a single reducer. rn is derived afterwards on
    # the ≤top_pairs-row result where a window costs nothing.
    order = [F.desc("jaccard"), F.asc("doc1"), F.asc("doc2")]
    top = jac.orderBy(*order).limit(top_pairs)
    w = Window.orderBy(*order)
    return top.withColumn("rn", F.row_number().over(w)).select(
        "doc1", "doc2", "shared", "jaccard", "rn"
    )


def minhash_bands(
    sets: DataFrame, n_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """(doc, band, bucket) LSH band table over a (doc, shingle) set table —
    the unit minhash_lsh_pairs pairs on and the surface lsh_hot_buckets
    meters. Signatures are md5-derived mins (engine-reproducible); banding
    is one explode of a literal struct array (one pass over ``sig``, not a
    union branch per band); the result is localCheckpoint-materialized
    because both sides of the candidate self-join consume it."""
    aggs = [
        F.min(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle"))), 1, 16)
        ).alias(f"sig_{j}")
        for j in range(n_hashes)
    ]
    sig = sets.groupBy("doc").agg(*aggs)
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|", *[F.col(f"sig_{b * band_size + j}") for j in range(band_size)]
                ).alias("bucket"),
            )
            for b in range(n_hashes // band_size)
        ]
    )
    return (
        sig.select("doc", F.explode(band_arr).alias("bb"))
        .select("doc", "bb.band", "bb.bucket")
        .localCheckpoint()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 8,
    band_size: int = 2,
    tau: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    max_bucket: int | None = LSH_MAX_BUCKET,
) -> DataFrame:
    """MinHash-LSH candidate pairs + exact-jaccard verification.

    Signatures: sig_j = min over word-``shingle_n``-gram shingles of
    md5(j || ':' || shingle) (first 16 hex chars; lexicographic min ≡
    numeric min for fixed-width lowercase hex — reproducible in DuckDB for
    the oracle). Banding with ``n_hashes/band_size`` bands; pairs sharing
    any band are candidates, then verified with exact shingle-set jaccard
    ≥ τ.

    Shingles must be n-grams (n ≥ 3), NOT unigrams: over a small
    vocabulary, unigram sets make nearly all documents collide and the pair
    output degenerates to O(n²) — measured 8.5M pairs / 288 s at sf0.1
    before this fix vs bounded output after.

    Plan shape (r06): ONE ``groupBy(doc)`` builds the per-doc profile —
    shingle-set array + size + all signature mins (`_doc_profiles`) — and
    is the only materialization (localCheckpoint; a checkpoint table on a
    real cluster). Banding is an explode of a literal struct array over the
    profile (one pass, not one union branch per band), and verification is
    ``size(array_intersect)`` of the two member arrays per candidate pair:
    exact jaccard (both arrays are distinct sets) with NO join/broadcast of
    the exploded (doc, shingle) table — the r05 plan shipped that table
    twice (once per pair side) plus twice more for the size aggregates.
    (History: the r03 recomputation fix was 98 s → 6 s at sf0.1; this
    round's array verify takes the same query 4.3 s → ~2.5 s.)

    Band buckets larger than ``max_bucket`` are excluded from pairing
    (``None`` disables): honest signatures bound EXPECTED bucket sizes, but
    a boilerplate-degenerate corpus (millions of near-identical documents)
    makes one bucket hold them all and the self-join emits k² rows no
    matter how the rest of the plan is shaped. Dropped buckets surface as
    ``canonical.lsh_hot_buckets(bands)`` metrics rows — at scale, log that
    next to the pair output. The DuckDB driver twin mirrors the cap."""
    profiles = _doc_profiles(
        docs, text_col, id_col, shingle_n, sig_hashes=n_hashes
    ).localCheckpoint()
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|", *[F.col(f"sig_{b * band_size + j}") for j in range(band_size)]
                ).alias("bucket"),
            )
            for b in range(n_hashes // band_size)
        ]
    )
    bands = profiles.select("doc", F.explode(band_arr).alias("bb")).select(
        "doc", "bb.band", "bb.bucket"
    )
    if max_bucket is not None:
        hot = lsh_hot_buckets(bands, max_bucket).select("band", "bucket")
        bands = bands.join(hot, ["band", "bucket"], "left_anti")
    l = bands.select("band", "bucket", F.col("doc").alias("doc1"))
    r = bands.select("band", "bucket", F.col("doc").alias("doc2"))
    cand = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )
    # verify: exact jaccard via per-pair array intersection of the full sets
    p1 = profiles.select(
        F.col("doc").alias("doc1"), F.col("sh").alias("sh1"), F.col("n_sh").alias("n1")
    )
    p2 = profiles.select(
        F.col("doc").alias("doc2"), F.col("sh").alias("sh2"), F.col("n_sh").alias("n2")
    )
    shared = F.size(F.array_intersect("sh1", "sh2"))
    return (
        cand.join(p1, "doc1")
        .join(p2, "doc2")
        .withColumn(
            "jaccard",
            F.round(shared / (F.col("n1") + F.col("n2") - shared), 4),
        )
        .filter(F.col("jaccard") >= tau)
        .select("doc1", "doc2", "jaccard")
    )


def near_dup_clusters(
    docs: DataFrame,
    tau: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = LSH_MAX_BUCKET,
) -> DataFrame:
    """Consolidate near-dup pairs into clusters with one keeper per
    cluster: MinHash-LSH pairs → connected components → keeper = min doc
    id. The corpus-dedup equivalent of surface-form canonicalization
    (same CC kernel, canonical.py).

    Node ids go through zero-padded strings so the CC min is numeric
    order; output is (doc_id, keeper_id, cluster_size)."""
    from mannheimsearchjoinsengine_spark.operators.canonical import connected_components

    pairs = minhash_lsh_pairs(
        docs, tau=tau, text_col=text_col, id_col=id_col, max_bucket=max_bucket
    )
    pad = lambda c: F.lpad(F.col(c).cast("string"), 12, "0")  # noqa: E731
    edges = pairs.select(pad("doc1").alias("src"), pad("doc2").alias("dst"))
    comp = connected_components(edges).select(
        F.col("node").cast("long").alias(id_col),
        F.col("component").cast("long").alias("keeper_id"),
    )
    # singleton docs keep themselves
    all_docs = docs.select(F.col(id_col))
    full = all_docs.join(comp, id_col, "left").select(
        id_col, F.coalesce("keeper_id", F.col(id_col)).alias("keeper_id")
    )
    size = full.groupBy("keeper_id").agg(F.count("*").alias("cluster_size"))
    return full.join(size, "keeper_id").select(id_col, "keeper_id", "cluster_size")


def simhash(docs: DataFrame, bits: int = 16, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc SimHash signature: bit b is 1 when Σ_tokens (±1 by md5-bit b)
    > 0. Token bit b is bit (b mod 4) of the token's md5 hex digit b//4 —
    the production width (bits=64) and the 16-bit demo width (kept for the
    DuckDB driver oracle) share one scheme. md5-derived bits →
    engine-reproducible. Returns (doc, simhash); at bits=64 the top bit
    lands in the long's sign bit — the signature is an opaque identifier,
    so that's fine (the b=63 term is added LAST, so every partial sum of
    the distinct powers of two stays in long range under ANSI mode).

    Hard cap at 64: the signature packs into ONE long, and Spark's
    ``shiftleft`` masks the shift amount to 6 bits (Java ``<<``), so a
    b ≥ 64 vote would silently alias onto bit b−64 — corrupt signatures,
    not an error. A wider SimHash needs an array-of-longs signature, which
    nothing here requires."""
    if bits > 64:
        raise ValueError("signature packs into one long: bits must be <= 64")
    # project the digest ONCE per token row — referenced from `bits`
    # aggregate expressions below, an inline md5 would be re-hashed per bit
    # (64x at production width) unless codegen's subexpression elimination
    # happens to fire; a projected column makes it structural
    sets = _token_sets(docs, text_col, id_col, 1).select(
        "doc", F.md5(F.col("shingle")).alias("h")
    )
    h = F.col("h")
    bit_votes = [
        F.sum(
            F.when(
                F.shiftright(
                    F.conv(F.substring(h, b // 4 + 1, 1), 16, 10).cast("int"),
                    b % 4,
                )
                % 2
                == 1,
                1,
            ).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    votes = sets.groupBy("doc").agg(*bit_votes)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(
            F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("doc", sig.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    hamming_max: int = 3,
    bits: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = LSH_MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``hamming_max``,
    blocked EXACTLY by pigeonhole banding (Manku, Jain & Das Sarma,
    "Detecting Near-Duplicates for Web Crawling", WWW 2007): split the
    ``bits``-bit signature into ``hamming_max + 1`` contiguous bands — a
    pair differing in ≤ hamming_max bits leaves at least one band
    untouched, so same-band bucketing has RECALL 1 by construction (unlike
    MinHash banding) and the exact Hamming verify only prunes. Returns
    (doc1, doc2, hamming).

    Scale shape: one self-join per the union'd band table, bucketed on
    (band, band-bits value); verification is a bit_count over XOR —
    native codegen, no Python. Degenerate buckets (boilerplate corpora
    collapse to one signature) get the same ``max_bucket`` drop-cap +
    ``lsh_hot_buckets`` metrics surface as the MinHash path — with the
    same stated recall tradeoff on pathological clusters.

    Width: run PRODUCTION corpora at the default 64 bits — a ``bits``-bit
    space saturates by the birthday bound (at 16 bits any ≳300-doc corpus
    collides constantly and the pair output grows ~quadratically in N,
    763k pairs at 6k docs measured); the 16-bit form exists only to keep
    the driver's exhaustive SQL twin tractable, mirroring doc_simhash."""
    if not 0 <= hamming_max < bits:
        raise ValueError(f"hamming_max must be in [0, {bits})")
    sig = simhash(docs, bits, text_col, id_col).localCheckpoint()
    n_bands = hamming_max + 1
    base, rem = divmod(bits, n_bands)
    starts, s = [], 0
    for b in range(n_bands):
        w = base + (1 if b < rem else 0)
        starts.append((s, w))
        s += w
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), st).bitwiseAND(
                    F.lit((1 << w) - 1 if w < 64 else -1).cast("long")
                ).alias("bucket"),
            )
            for b, (st, w) in enumerate(starts)
        ]
    )
    bands = sig.select(F.col("doc"), F.explode(band_arr).alias("bb")).select(
        "doc", "bb.band", "bb.bucket"
    )
    if max_bucket is not None:
        hot = lsh_hot_buckets(bands, max_bucket).select("band", "bucket")
        bands = bands.join(hot, ["band", "bucket"], "left_anti")
    l = bands.select("band", "bucket", F.col("doc").alias("doc1"))
    r = bands.select("band", "bucket", F.col("doc").alias("doc2"))
    cand = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )
    s1 = sig.select(F.col("doc").alias("doc1"), F.col("simhash").alias("s1"))
    s2 = sig.select(F.col("doc").alias("doc2"), F.col("simhash").alias("s2"))
    return (
        cand.join(s1, "doc1")
        .join(s2, "doc2")
        .select(
            "doc1",
            "doc2",
            F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_max)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 4,
    planes_per_table: int | None = 4,
    dim: int = 64,
    brute_force: bool = False,
    target_bucket: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ τ), LSH-bucketed by default.

    .. warning:: BEHAVIOR CHANGE (round 2): the default switched from
       exhaustive O(N²) pairs (recall 1.0) to LSH-blocked candidates
       (recall < 1 by construction — measured ≥ 0.7 on planted dups in
       pytest). Callers needing the exact pair set at cos ≥ τ must now pass
       ``brute_force=True``; the default is the only shape that survives
       100 TB.

    LSH blocking:
    multi-table random-hyperplane signatures block the self-join to same-
    bucket pairs, then exact cosine verifies — candidate cost is per-bucket
    bounded, never the O(N²) crossJoin. The hyperplanes are md5-derived
    (ann.lsh_bucket), so the driver oracle reproduces the exact candidate
    set; recall < 1 vs brute force by construction (pytest measures it).

    ``brute_force=True`` keeps the exhaustive pair join — the pytest recall
    oracle, NOT a plan for scale. Dot products via zip_with/aggregate —
    native, no Python.

    Bucket-size note (why this path has NO minhash-style ``max_bucket``
    drop-cap): hyperplane buckets are DENSE by construction — every vector
    lands in one of 2^planes_per_table buckets per table, so expected
    bucket size is N/2^p and "hot bucket" is the normal state, not a
    degenerate corpus. Dropping hot buckets here would discard most of the
    corpus; the scale knob is ``planes_per_table`` itself — size it so
    N/2^p stays at the per-bucket pair budget (p ≈ log2(N/1000) keeps a
    bucket's self-join under ~10⁶ rows), trading recall per table for more
    ``n_tables``. The minhash drop-cap guards a different failure mode
    (identical signatures from boilerplate text, a data pathology).

    ``planes_per_table=None`` sizes p from a MEASURED corpus count:
    p = clamp(2, ceil(log2(N / target_bucket)), 24) — the executable form
    of the rule above (one count job; the fixed default 4 is what the
    cross-engine oracle pins)."""
    if planes_per_table is None:
        import math

        n = emb.count()
        planes_per_table = max(
            2, min(24, math.ceil(math.log2(max(n, 2) / target_bucket)))
        )
    from mannheimsearchjoinsengine_spark.operators.ann import lsh_bucket

    if brute_force:
        a = emb.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
        b = emb.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
        pairs = a.crossJoin(b).filter(F.col("id1") < F.col("id2"))
    else:
        # one union branch per table, NOT an explode of a per-table struct
        # array: the r06 A/B measured the single-scan explode at 0.70x —
        # the n_tables parquet scans are cheap, and the union branches keep
        # each table's 4-plane signature expression in its own codegen span
        tables = None
        for t in range(n_tables):
            bt = emb.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("v"),
                F.lit(t).alias("table_no"),
                lsh_bucket(
                    F.col(vec_col), planes_per_table, dim, plane_offset=t * planes_per_table
                ).alias("bucket"),
            )
            tables = bt if tables is None else tables.union(bt)
        l = tables.select("table_no", "bucket", F.col("id").alias("id1"), F.col("v").alias("v1"))
        r = tables.select("table_no", "bucket", F.col("id").alias("id2"), F.col("v").alias("v2"))
        pairs = (
            l.join(r, ["table_no", "bucket"])
            .filter(F.col("id1") < F.col("id2"))
            .select("id1", "v1", "id2", "v2")
            .dropDuplicates(["id1", "id2"])
        )
    dot = F.aggregate(
        F.zip_with("v1", "v2", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    n1 = F.sqrt(F.aggregate("v1", F.lit(0.0), lambda a_, x: a_ + x * x))
    n2 = F.sqrt(F.aggregate("v2", F.lit(0.0), lambda a_, x: a_ + x * x))
    cos = F.round(dot / (n1 * n2), 4)
    return pairs.select("id1", "id2", cos.alias("cosine")).filter(
        F.col("cosine") >= tau
    )
