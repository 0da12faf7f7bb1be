"""Text-analysis kernels for training-data pipelines (task add-ons beyond
the reference inventory): token counting, language-ID heuristic, quality
scoring, document fingerprinting.

All native Catalyst expressions — codegen'd, zero Python. Each has a DuckDB
twin for the driver oracle. At 100 TB these are pure narrow maps over the
document scan — they pushdown-project just the text column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword signatures for the n-gram/stopword-hit heuristic
LANG_SIGNATURES = {
    "en": ["the", "a", "and", "of", "to", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "la", "los", "que", "es", "una"],
}

# BPE-ish word/number/punct splitter (GPT-2 style coarse classes)
BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def ws_token_count(col: Column) -> Column:
    """Whitespace token count."""
    toks = F.filter(F.split(F.trim(col), r"\s+"), lambda x: x != F.lit(""))
    return F.size(toks)


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: count of word / number / punctuation pieces."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_RE), F.lit(0)))


def lang_scores(col: Column) -> dict[str, Column]:
    """Stopword-hit count per language over whitespace tokens."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    out = {}
    for lang, words in LANG_SIGNATURES.items():
        sig = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda x: F.array_contains(sig, x)))
    return out


def quality_features(col: Column) -> dict[str, Column]:
    """Quality-scoring features: length, word stats, punct + stopword ratios."""
    toks = F.filter(F.split(F.trim(col), r"\s+"), lambda x: x != F.lit(""))
    n_tok = F.size(toks)
    n_char = F.length(col)
    n_punct = F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), F.lit(0)))
    sig = F.array(*[F.lit(w) for w in LANG_SIGNATURES["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(sig, F.lower(x))))
    return {
        "n_chars": n_char,
        "n_tokens": n_tok,
        "avg_token_len": F.round((n_char - n_tok + 1) / n_tok, 4),
        "punct_ratio": F.round(n_punct / F.greatest(n_char, F.lit(1)), 4),
        "stopword_ratio": F.round(n_stop / F.greatest(n_tok, F.lit(1)), 4),
    }


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized token
    stream (rolling-hash analog that is reproducible in any engine)."""
    toks = F.filter(F.split(F.lower(F.trim(col)), r"\s+"), lambda x: x != F.lit(""))
    return F.md5(F.array_join(toks, " "))


# ------------------------------------------------------------- DuckDB twins

def duck_ws_token_count(expr: str) -> str:
    return f"len(list_filter(string_split_regex(trim({expr}), '\\s+'), x -> x <> ''))"


def duck_bpe_token_count(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{BPE_RE}'))"


def duck_lang_score(expr: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_SIGNATURES[lang])
    toks = f"string_split_regex(lower(trim({expr})), '\\s+')"
    return f"len(list_filter({toks}, x -> list_contains([{words}], x)))"


def duck_fingerprint(expr: str) -> str:
    toks = f"list_filter(string_split_regex(lower(trim({expr})), '\\s+'), x -> x <> '')"
    return f"md5(array_to_string({toks}, ' '))"
