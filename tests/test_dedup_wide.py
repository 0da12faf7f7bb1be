"""Production-width dedup parameters (r03 directive #5).

The driver oracles keep the demo widths (8 MinHash hashes / 4 bands,
16-bit SimHash) because the DuckDB twins inline one expression per
hash/bit. This suite pins the SAME operators at the widths a 100 TB run
would use, cross-checked against an independent pure-Python
reimplementation of the md5 scheme:

* SimHash 64-bit (nibble-bit scheme: token bit b = bit b%4 of md5 hex
  digit b//4; capped at 64 — the signature packs into one long and
  shiftleft masks the shift amount, so wider widths would alias).
* MinHash 64 hashes in 16 bands of 4 (band threshold (1/16)^(1/4) ≈ 0.50
  — matched to the default tau=0.5; 8 bands of 8 would put the S-curve
  knee at (1/8)^(1/8) ≈ 0.77 and drop most tau-level pairs).

Collision-rate note (this deterministic 32-doc corpus, tau=0.5): demo
width 8/2 (4 bands of 2) admits 10 candidate pairs of which 8 verify;
production 64/4 (16 bands of 4) admits 8 candidates — zero false
candidates — with the same 8 verified, at full recall vs the brute-force
truth (all asserted below). The sub-threshold half-overlap docs
(jaccard ≈ 0.25-0.35) are what the narrow bands leak: P(collide) at s=0.3
is 1-(1-s²)⁴ ≈ 31% per pair at 8/2 vs 1-(1-s⁴)¹⁶ ≈ 12% at 64/4, and the
gap widens fast below the knee. Fewer false candidates is what matters at
scale: the verify join is the expensive stage.
"""

from __future__ import annotations

import hashlib
import itertools

import pytest
from pyspark.sql import functions as F

from mannheimsearchjoinsengine_spark.operators import dedup


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().strip().split() if t]


def _shingles(text: str, n: int) -> set[str]:
    t = _tokens(text)
    if len(t) < n:
        return set()
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _simhash_py(text: str, bits: int) -> int:
    votes = [0] * bits
    for sh in set(_tokens(text)):
        h = _md5(sh)
        for b in range(bits):
            d = int(h[b // 4], 16)
            votes[b] += 1 if (d >> (b % 4)) & 1 else -1
    sig = sum(1 << b for b in range(bits) if votes[b] > 0)
    if sig >= 1 << 63:  # Spark long wraps at the sign bit
        sig -= 1 << 64
    return sig


def _minhash_pairs_py(docs, n_hashes, band_size, tau, shingle_n=3):
    """Independent refimpl of minhash_lsh_pairs: md5 signatures, banded
    buckets, exact-jaccard verification."""
    sets = {i: _shingles(t, shingle_n) for i, t in docs}
    sigs = {
        i: [min(_md5(f"{j}:{s}")[:16] for s in sh) for j in range(n_hashes)]
        for i, sh in sets.items()
        if sh
    }
    n_bands = n_hashes // band_size
    buckets: dict[tuple[int, str], list[int]] = {}
    for i, sig in sigs.items():
        for b in range(n_bands):
            key = (b, "|".join(sig[b * band_size : (b + 1) * band_size]))
            buckets.setdefault(key, []).append(i)
    cand = {
        (a, b)
        for members in buckets.values()
        for a, b in itertools.combinations(sorted(members), 2)
    }
    out = {}
    for a, b in cand:
        inter = len(sets[a] & sets[b])
        jac = round(inter / (len(sets[a]) + len(sets[b]) - inter), 4)
        if jac >= tau:
            out[(a, b)] = jac
    return cand, out


def _brute_pairs_py(docs, tau, shingle_n=3):
    sets = {i: _shingles(t, shingle_n) for i, t in docs}
    out = {}
    for (a, sa), (b, sb) in itertools.combinations(sorted(sets.items()), 2):
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        jac = round(inter / (len(sa) + len(sb) - inter), 4)
        if jac >= tau:
            out[(a, b)] = jac
    return out


@pytest.fixture(scope="module")
def corpus():
    """32 deterministic docs: 8 templates × (original, near-dup with one
    word changed, sub-threshold half-overlap, unrelated)."""
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "apache spark executes distributed dataframe plans with whole stage codegen",
        "knowledge graphs link subjects to objects through typed predicates",
        "duplicate detection shingles documents into overlapping word ngrams",
        "minhash signatures approximate jaccard similarity between token sets",
        "locality sensitive hashing buckets similar signatures into bands",
        "the reference engine normalizes labels with a word delimiter filter",
        "parquet footers carry row counts readable without a cluster job",
    ]
    docs = []
    for k, b in enumerate(base):
        words = b.split()
        near = " ".join(words[:-1] + ["edited"])
        half = " ".join(words[: len(words) // 2] + [f"f{k}a{j}" for j in range(6)])
        unrelated = " ".join(f"w{k}x{j}" for j in range(12))
        docs += [
            (4 * k, b),
            (4 * k + 1, near),
            (4 * k + 2, half),
            (4 * k + 3, unrelated),
        ]
    return docs


def test_simhash_64bit_matches_refimpl(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id: long, text: string")
    got = {r.doc: r.simhash for r in dedup.simhash(df, bits=64).collect()}
    want = {i: _simhash_py(t, 64) for i, t in corpus}
    assert got == want
    # near-dup pairs are close in hamming distance, unrelated pairs far
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    near = ham(got[0], got[1])
    far = ham(got[0], got[3])
    assert near < 16 < far


def test_simhash_demo_width_still_matches(spark, corpus):
    """The 16-bit demo width (driver-oracled) under the same scheme."""
    df = spark.createDataFrame(corpus, "doc_id: long, text: string")
    got = {r.doc: r.simhash for r in dedup.simhash(df, bits=16).collect()}
    want = {i: _simhash_py(t, 16) for i, t in corpus}
    assert got == want


def test_simhash_width_cap(spark, corpus):
    # widths > 64 would alias onto low bits (shiftleft masks the shift
    # amount to 6 bits for longs) — must refuse, not corrupt
    df = spark.createDataFrame(corpus, "doc_id: long, text: string")
    for bad in (65, 128, 256):
        with pytest.raises(ValueError):
            dedup.simhash(df, bits=bad)


def test_minhash_production_width_matches_refimpl(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id: long, text: string")
    got = {
        (r.doc1, r.doc2): r.jaccard
        for r in dedup.minhash_lsh_pairs(df, n_hashes=64, band_size=4).collect()
    }
    _, want = _minhash_pairs_py(corpus, 64, 4, tau=0.5)
    assert got == want


def test_minhash_width_tradeoff(spark, corpus):
    """The collision-rate note in the module docstring, asserted: the
    production width admits ~3× fewer false candidates than the demo width
    at full recall vs brute force."""
    truth = _brute_pairs_py(corpus, tau=0.5)
    demo_cand, demo_ver = _minhash_pairs_py(corpus, 8, 2, tau=0.5)
    prod_cand, prod_ver = _minhash_pairs_py(corpus, 64, 4, tau=0.5)
    assert set(prod_ver) == set(truth)  # full recall at the matched knee
    assert len(prod_cand) < len(demo_cand)  # fewer false candidates
    # pin the documented numbers so the docstring stays honest
    assert (len(demo_cand), len(demo_ver)) == (10, 8)
    assert (len(prod_cand), len(prod_ver)) == (8, 8)


def test_simhash_pairs_banded_equals_brute_force(spark, corpus):
    """The pigeonhole banding (hamming_max+1 bands) has recall 1: the
    banded distributed plan must equal the exhaustive O(n²) definition at
    the 64-bit production width, for several k."""
    df = spark.createDataFrame(corpus, "doc_id: long, text: string")
    sigs = {i: _simhash_py(t, 64) for i, t in corpus}
    mask = (1 << 64) - 1
    for k in (1, 3, 8):
        got = {
            (r.doc1, r.doc2): r.hamming
            for r in dedup.simhash_pairs(df, hamming_max=k, bits=64).collect()
        }
        want = {}
        ids = sorted(sigs)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                h = bin((sigs[ids[x]] ^ sigs[ids[y]]) & mask).count("1")
                if h <= k:
                    want[(ids[x], ids[y])] = h
        assert got == want, f"k={k}"


def test_simhash_pairs_degenerate_bucket_guard(spark):
    """Identical documents share every band bucket; above the cap they are
    dropped from pairing (same loud-metrics tradeoff as the MinHash path)."""
    from pyspark.sql import Row  # noqa: PLC0415

    docs = [Row(doc_id=i, text="same boilerplate text everywhere") for i in range(25)]
    docs += [Row(doc_id=100 + j, text=f"distinct document {j} alpha{j} beta{j}") for j in range(4)]
    df = spark.createDataFrame(docs)
    raw = dedup.simhash_pairs(df, hamming_max=2, bits=64, max_bucket=None)
    assert raw.filter(F.col("doc1") < 25).count() == 300  # C(25,2)
    capped = dedup.simhash_pairs(df, hamming_max=2, bits=64, max_bucket=10)
    assert capped.filter(F.col("doc1") < 25).count() == 0
