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
hypernyms, tier 3 for hyponyms. ``WordnetAPI.getSynonyms/getHypernyms/
getHyponyms`` each take the FIRST noun sense only (``WordnetAPI.java:
50-56``) — :mod:`wordnet_build` builds this table from a public WNDB
``index.noun``/``data.noun`` pair with exactly that rule.

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
* n-gram fallback PER SIDE when that side's extended list is empty (the
  label is out of dictionary, :158-161): the side's relation list becomes
  the relations of its word 1-2-grams — only grams whose synonym list is
  non-empty contribute (``populateNgramList:297-315`` skips a gram with no
  synonyms), each contributing its synonyms + hypernyms ONLY (the hyponym
  call at :305 is commented out in the reference), and a bigram with any
  synonyms REPLACES the unigram accumulations (:300-303 clears the list).
  A mixed pair therefore intersects the in-dict side's EXTENDED list with
  the out-of-dict side's ngram list — modeled exactly: each side owns one
  relation list (extended if in dict, else ngram) and the price-2 branch
  fires on any cross-side intersection.
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
    ext = lexicon.select("word", "related")  # tier 1+2+3 (full extension)
    # ngram-eligible lexicon rows: the gram must itself have a non-empty
    # synonym list (populateNgramList:297-299 skips it otherwise) and only
    # its synonyms + hypernyms are accumulated (hyponym call :305 is
    # commented out in the reference) — tiers 1-2, left-semi'd on tier 1
    ng_lex = (
        lexicon.filter(F.col("tier") <= 2)
        .join(lexicon.filter(F.col("tier") == 1).select("word"), "word", "left_semi")
        .select("word", "related")
    )

    # 1-2-word ngrams of a normalized label; bigrams first so the
    # replace-unigrams rule can key off them
    toks = F.split(F.col("n"), " ")
    grams1 = toks
    grams2 = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def side_rel(side_col: str) -> DataFrame:
        """One relation list per pair side, matchStrings:140-161 shape: the
        EXTENDED list (syn+hyper+hypo of the whole label) when the label is
        in dictionary, else the ngram fallback list — so a mixed pair
        intersects extended-vs-ngram exactly as the reference does."""
        side = p.select("pair_id", F.col(side_col).alias("n"))
        in_dict = (
            side.join(F.broadcast(ext), side["n"] == ext["word"])
            .select("pair_id", "related")
        )
        ood = side.join(in_dict.select("pair_id"), "pair_id", "left_anti")
        g = ood.select("pair_id", F.explode(F.concat(grams2, grams1)).alias("gram"))
        rel = g.join(F.broadcast(ng_lex), g["gram"] == ng_lex["word"]).select(
            "pair_id",
            "related",
            F.col("gram").contains(" ").alias("is_bi"),
        )
        # bigram relations win when present (populateNgramList clears on a
        # longer ngram with synonyms)
        any_bi = rel.filter("is_bi").select("pair_id").distinct().withColumn("bi", F.lit(True))
        kept = (
            rel.join(any_bi, "pair_id", "left")
            .filter(F.col("is_bi") | F.col("bi").isNull())
            .select("pair_id", "related")
        )
        return in_dict.union(kept)

    rel_hit = (
        side_rel("nl")
        .join(
            side_rel("nr").withColumnRenamed("related", "related_r"),
            "pair_id",
        )
        .filter(F.col("related") == F.col("related_r"))
        .select("pair_id")
        .distinct()
        .withColumn("rel_hit", F.lit(True))
    )

    out = p.join(rel_hit, "pair_id", "left")
    gate = (F.length("label1") < 3) | (F.length("label2") < 3) | (
        F.length("nl") < 3
    ) | (F.length("nr") < 3)
    price = (
        F.when(
            F.coalesce(F.col("rel_hit"), F.lit(False)),
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
