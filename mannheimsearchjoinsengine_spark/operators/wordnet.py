"""F7 — WordNet-backed label similarity (pluggable lexicon).

Reference: ``schemamatching/label/LabelBasedComparer.matchStrings:107-186``
with ``lod/WordnetAPI.java`` (MIT JWI over a local WordNet 2.1 dict). The
reference SHIPS THIS DISABLED (``searchJoins.conf:67-69`` — the label
matcher runs without the WordNet tier), and this sandbox has no WordNet
database, so the operator takes the lexicon as a DATAFRAME — the natural
Spark form: instead of per-call JWI dictionary lookups, the whole lexicon is
broadcast and the score is three semi-join flags plus a codegen jaccard.

Lexicon schema: ``(word string, related string, tier int)`` — tier 1 for
synset members (a word's synset includes its own lemma), tier 2 for
hypernyms/hyponyms. ``WordnetAPI.getSynonyms/getHypernyms/getHyponyms``
each take the FIRST noun sense only (``WordnetAPI.java:50-56``) — encode
that choice when building the lexicon table.

Replicated semantics of ``matchStrings`` (price = last assignment wins):

* either raw label shorter than 3 chars → score 0; labels are then
  ``clearString``-normalized (no bracket removal) and re-gated at 3 chars.
* price starts at 1; equal normalized labels price 2.2 — the
  ``WORDNET_EXACT_MATCH_SCORE = 5`` branch (:126-129) is DEAD CODE in the
  reference: the unconditional ``if equals`` right after it (:131-132)
  overwrites 5 with synsetMatch+0.2, and an in-dictionary equal pair then
  hits the synonym-overlap branch (identical synsets) and lands at 2.0.
  Replicated, not fixed.
* non-empty intersection of the two synonym lists → price 2
  (``matchTwoLists`` uses SecondString Levenshtein score ≥ 0, i.e. EXACT
  string equality, :323-331 — intersection, not fuzzy match).
* intersection after extending both lists with hypernyms+hyponyms → 2.
* n-gram fallback when a side's extended list is empty: relations of the
  label's word 1-2-grams, where a bigram with any relations REPLACES the
  unigram accumulations (``populateNgramList:297-315`` clears the list
  when a longer ngram has synonyms) → intersection → 2.
* final score = char-2-4-gram jaccard of the normalized labels × price
  (:182-185; the same combined-gram kernel as F1, functions/similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mannheimsearchjoinsengine_spark.functions.normalize import clear_string
from mannheimsearchjoinsengine_spark.functions.similarity import string_sim_24

WORDNET_SYNSET_MATCH_SCORE = 2.0  # LabelBasedComparer.java:34
WORDNET_EQUAL_PRICE = 2.2  # :131-132 (synsetMatch + 0.2)


def _overlap_flag(pairs: DataFrame, lex_l: DataFrame, lex_r: DataFrame, name: str) -> DataFrame:
    """(pair_id, <name>=true) for pairs whose lexicon relation sets
    intersect — two broadcast joins + a distinct on the tiny flag set."""
    hit = (
        pairs.join(F.broadcast(lex_l), pairs["nl"] == lex_l["word"])
        .select("pair_id", "nr", "related")
        .join(
            F.broadcast(lex_r.withColumnRenamed("related", "related_r")),
            on=[F.col("nr") == F.col("word"), F.col("related") == F.col("related_r")],
        )
        .select("pair_id")
        .distinct()
        .withColumn(name, F.lit(True))
    )
    return hit


def _ngram_lexicon(lex: DataFrame) -> DataFrame:
    """Relations keyed by each 1-2-word ngram of a label are just the plain
    lexicon rows — the ngram expansion happens on the LABEL side."""
    return lex


def wordnet_label_scores(
    pairs: DataFrame,
    lexicon: DataFrame,
    left: str = "label1",
    right: str = "label2",
) -> DataFrame:
    """Score label pairs with the replicated ``matchStrings`` cascade.

    ``pairs``: any DataFrame with two label columns. ``lexicon``: (word,
    related, tier) as in the module docstring; broadcast at every use —
    WordNet-sized lexicons (~150k rows) broadcast comfortably.
    Returns (label1, label2, price, wn_score).
    """
    p = (
        pairs.select(
            F.col(left).alias("label1"),
            F.col(right).alias("label2"),
        )
        .withColumn("pair_id", F.monotonically_increasing_id())
        .withColumn("nl", clear_string(F.col("label1")))
        .withColumn("nr", clear_string(F.col("label2")))
        .localCheckpoint()
    )
    syn = lexicon.filter(F.col("tier") == 1).select("word", "related")
    ext = lexicon.select("word", "related")  # tier 1+2

    syn_hit = _overlap_flag(p, syn, syn, "syn_hit")
    ext_hit = _overlap_flag(p, ext, ext, "ext_hit")

    # n-gram fallback lists: label-side 1-2-word ngrams looked up in the
    # lexicon; bigram relations replace unigram ones when any bigram hits
    toks = F.split(F.col("n"), " ")
    grams1 = toks
    grams2 = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def side_ngram_rel(side_col: str, alias: str) -> DataFrame:
        side = p.select("pair_id", F.col(side_col).alias("n"))
        g = side.select(
            "pair_id",
            F.explode(F.concat(grams2, grams1)).alias("gram"),
            (F.size(F.split(F.col("n"), " ")) >= 2).alias("has_bi"),
        )
        rel = g.join(F.broadcast(ext), g["gram"] == ext["word"]).select(
            "pair_id",
            "related",
            (F.length(F.col("gram")) - F.length(F.regexp_replace("gram", " ", "")) > 0).alias(
                "is_bi"
            ),
        )
        # bigram relations win when present (populateNgramList clears on a
        # longer ngram with synonyms)
        any_bi = rel.filter("is_bi").select("pair_id").distinct().withColumn("bi", F.lit(True))
        kept = (
            rel.join(any_bi, "pair_id", "left")
            .filter(F.col("is_bi") | F.col("bi").isNull())
            .select("pair_id", F.col("related").alias(alias))
        )
        return kept

    ngl = side_ngram_rel("nl", "rel_l")
    ngr = side_ngram_rel("nr", "rel_r")
    ng_hit = (
        ngl.join(ngr, "pair_id")
        .filter(F.col("rel_l") == F.col("rel_r"))
        .select("pair_id")
        .distinct()
        .withColumn("ng_hit", F.lit(True))
    )
    # the ngram tier only applies to a side whose own extended list is
    # empty (:158-161) — a side WITH relations keeps its real list, so the
    # ngram flag can only add a match when ext_hit missed; over-approx
    # gated below by ext-list emptiness per side
    has_rel_l = (
        p.join(F.broadcast(ext), p["nl"] == ext["word"]).select("pair_id").distinct()
        .withColumn("l_in_dict", F.lit(True))
    )
    has_rel_r = (
        p.join(F.broadcast(ext), p["nr"] == ext["word"]).select("pair_id").distinct()
        .withColumn("r_in_dict", F.lit(True))
    )

    out = (
        p.join(syn_hit, "pair_id", "left")
        .join(ext_hit, "pair_id", "left")
        .join(ng_hit, "pair_id", "left")
        .join(has_rel_l, "pair_id", "left")
        .join(has_rel_r, "pair_id", "left")
    )
    gate = (F.length("label1") < 3) | (F.length("label2") < 3) | (
        F.length("nl") < 3
    ) | (F.length("nr") < 3)
    ng_applies = F.coalesce(F.col("ng_hit"), F.lit(False)) & (
        F.col("l_in_dict").isNull() | F.col("r_in_dict").isNull()
    )
    price = (
        F.when(
            F.coalesce(F.col("syn_hit"), F.lit(False))
            | F.coalesce(F.col("ext_hit"), F.lit(False))
            | ng_applies,
            F.lit(WORDNET_SYNSET_MATCH_SCORE),
        )
        .when(F.col("nl") == F.col("nr"), F.lit(WORDNET_EQUAL_PRICE))
        .otherwise(F.lit(1.0))
    )
    score = F.round(string_sim_24(F.col("nl"), F.col("nr")) * price, 4)
    return out.select(
        "label1",
        "label2",
        F.when(gate, F.lit(0.0)).otherwise(price).alias("price"),
        F.when(gate, F.lit(0.0)).otherwise(score).alias("wn_score"),
    )
