"""String normalization kernels (reference P1-P5).

Reference parity targets:
* ``schemamatching/label/StringNormalizer.java:39-141`` ("clearString"):
  Lucene WordDelimiterFilter (split on case change + letter/digit
  boundaries), whitespace tokenize, lowercase, stopword strip, optional
  Porter stem, re-join with single spaces.
* ``IO/ConvertFileToTable.simpleStringNormalization:1327-1353``: unescape
  HTML entities, strip quotes/pipes/braces/tags/newlines, optional
  parenthetical removal, lowercase, trim.
* ``StringNormalizer.clearString4FastJoin:60-72``: + strip non-ASCII,
  truncate to 127 chars.

Everything here is native Catalyst expressions (whole-stage codegen;
zero Python), EXCEPT the optional Porter stemmer which is an Arrow-batched
pandas UDF (the reference enables stemming only for headers/keys —
``searchJoins.conf:52-53`` — so the hot path stays JVM-side).

Each kernel has a twin ``duck_*`` builder emitting the equivalent DuckDB SQL
so driver-side oracles share the exact contract.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# English stopword subset used by the reference's analyzer
# (Lucene StandardAnalyzer ENGLISH_STOP_WORDS_SET) + custom stopwords.
STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
]

_ENTITY_RE = r"&(nbsp|amp|quot|lt|gt);"
_ASIDE_RE = r"\([^)]*\)|\[[^\]]*\]"
_NONWORD_RE = r"[^a-z0-9]+"


def simple_norm(col: Column) -> Column:
    """P2: simpleStringNormalization — cheap cleanup, case-preserving loss
    of markup only (``IO/ConvertFileToTable.java:1327-1353``)."""
    c = F.regexp_replace(col, _ENTITY_RE, " ")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    c = F.regexp_replace(c, r"[\"'|{}]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def norm_key(col: Column) -> Column:
    """Entity-surface canonical key: entity-unescape → drop asides → lower
    → non-alnum→space → tokens sorted → single-space join.

    Token-order invariance replaces the reference's bag-of-words Lucene
    match (``index/IndexManager.searchIndex:323-351`` ORs the tokens, so
    token order never mattered there either).
    """
    c = F.lower(col)
    c = F.regexp_replace(c, _ENTITY_RE, " ")
    c = F.regexp_replace(c, _ASIDE_RE, " ")
    c = F.regexp_replace(c, _NONWORD_RE, " ")
    # _NONWORD_RE collapses runs to one space, so a single-space split is
    # exact; array_remove (codegen) beats an interpreted filter-lambda 2.3×
    # on the 2M-turn bench; sort_array (codegen) over array_sort (lambda
    # comparator, breaks the WholeStageCodegen span — visible in .explain).
    toks = F.array_remove(F.split(F.trim(c), " "), "")
    return F.array_join(F.sort_array(toks), " ")


def norm_tokens(col: Column) -> Column:
    """Token array of the normalized surface (for jaccard / postings)."""
    c = F.lower(col)
    c = F.regexp_replace(c, _ENTITY_RE, " ")
    c = F.regexp_replace(c, _ASIDE_RE, " ")
    c = F.regexp_replace(c, _NONWORD_RE, " ")
    return F.array_remove(F.split(F.trim(c), " "), "")


def clear_string(col: Column, strip_stopwords: bool = True) -> Column:
    """P1 "clearString" analog: word-delimiter split (case change,
    letter/digit boundary), lowercase, optional stopword strip, re-join.

    ``schemamatching/label/StringNormalizer.java:39-141``.
    """
    # WordDelimiterFilter: break camelCase and letter<->digit transitions.
    c = F.regexp_replace(col, r"([a-z])([A-Z])", r"$1 $2")
    c = F.regexp_replace(c, r"([A-Za-z])([0-9])", r"$1 $2")
    c = F.regexp_replace(c, r"([0-9])([A-Za-z])", r"$1 $2")
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9$]+", " ")  # '$' special-cased (line 136-139)
    toks = F.array_remove(F.split(F.trim(c), " "), "")
    if strip_stopwords:
        sw = F.array(*[F.lit(s) for s in STOPWORDS])
        toks = F.filter(toks, lambda x: ~F.array_contains(sw, x))
    return F.array_join(toks, " ")


def fastjoin_norm(col: Column) -> Column:
    """P3: clearString → strip non-Basic-Latin → truncate to 127 chars
    (``StringNormalizer.clearString4FastJoin:60-72``)."""
    c = clear_string(col)
    c = F.regexp_replace(c, r"[^\x00-\x7F]", "")
    return F.substring(c, 1, 127)


def porter_stem_udf():
    """Arrow-batched Porter stemmer (P1 stemming branch,
    ``StringNormalizer.java:113-114``). Pure-python Porter (no deps),
    vectorized over pandas batches — never per-row Python in Spark."""

    from mannheimsearchjoinsengine_spark.functions._porter import stem_word

    @F.pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None if v is None else " ".join(stem_word(w) for w in v.split(" "))
        )

    return _stem


# ---------------------------------------------------------------- DuckDB twins

def duck_norm_key(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`norm_key` for oracle queries."""
    c = f"lower({expr})"
    c = f"regexp_replace({c}, '{_ENTITY_RE}', ' ', 'g')"
    c = f"regexp_replace({c}, '\\([^)]*\\)|\\[[^\\]]*\\]', ' ', 'g')"
    c = f"regexp_replace({c}, '[^a-z0-9]+', ' ', 'g')"
    toks = f"list_filter(string_split(trim({c}), ' '), x -> x <> '')"
    # coalesce: DuckDB's array_to_string([]) is NULL, Spark's array_join([])
    # is '' (hypothesis-found edge; empty surfaces are filtered upstream)
    return f"coalesce(array_to_string(list_sort({toks}), ' '), '')"


def duck_norm_tokens(expr: str) -> str:
    c = f"lower({expr})"
    c = f"regexp_replace({c}, '{_ENTITY_RE}', ' ', 'g')"
    c = f"regexp_replace({c}, '\\([^)]*\\)|\\[[^\\]]*\\]', ' ', 'g')"
    c = f"regexp_replace({c}, '[^a-z0-9]+', ' ', 'g')"
    return f"list_filter(string_split(trim({c}), ' '), x -> x <> '')"


def duck_simple_norm(expr: str) -> str:
    c = f"regexp_replace({expr}, '{_ENTITY_RE}', ' ', 'g')"
    c = f"regexp_replace({c}, '<[^>]*>', ' ', 'g')"
    c = f"regexp_replace({c}, '[\"''|{{}}]', ' ', 'g')"
    c = f"regexp_replace({c}, '\\s+', ' ', 'g')"
    return f"trim({c})"
