"""Build the F7 WordNet lexicon table from a public WNDB export.

The reference resolves labels against a local WordNet 2.1 dictionary via
MIT JWI (``lod/WordnetAPI.java``). This sandbox has no WordNet database, so
:mod:`wordnet` takes the lexicon as a DataFrame; this module produces that
DataFrame from the standard WNDB files (``index.noun`` + ``data.noun``,
format per the public ``wndb(5WN)`` man page) so the operator runs with
real data on any cluster that can ship the two files.

Replicated JWI/reference semantics (``WordnetAPI.java:45-123``):

* ``getIndexWord(word, POS.NOUN)`` → the FIRST listed sense only
  (``getWordIDs().get(0)``, :53/:76 — sense 1 in ``index.noun`` offset
  order). Every tier below is derived from that single synset.
* tier 1 (synonyms): the lemmas of the first-sense synset itself — a
  word's synonym list therefore always contains the word.
* tier 2 (hypernyms): lemmas of the synsets reached via the ``@`` pointer
  (``Pointer.HYPERNYM``; the ``@i`` instance-hypernym pointer is a
  DIFFERENT JWI pointer and is NOT followed).
* tier 3 (hyponyms): lemmas via ``~`` (``Pointer.HYPONYM``; ``~i``
  likewise excluded).
* every emitted lemma has ``_`` and ``-`` replaced by spaces
  (``replaceAll`` calls at :60/:91/:122), matching the
  ``clear_string``-normalized labels the operator joins on.

The ``word`` column is the index lemma with underscores as spaces — the
same key JWI derives when the reference passes a cleaned multi-word label.
Output rows are distinct (the operator's intersections are set-semantics).
"""

from __future__ import annotations

import os
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession

LEXICON_SCHEMA = "word string, related string, tier int"


def _parse_data_noun(path: str) -> dict[str, tuple[list[str], list[str], list[str]]]:
    """offset -> (lemmas, hypernym offsets, hyponym offsets) from a WNDB
    ``data.noun``. Fields per ``wndb(5WN)``: w_cnt is 2-digit hex, p_cnt
    3-digit decimal, each pointer is (symbol, offset, pos, source/target)."""
    synsets: dict[str, tuple[list[str], list[str], list[str]]] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.startswith("  ") or not line.strip():
                continue  # license header
            head = line.split(" | ")[0].rstrip()
            parts = head.split(" ")
            offset = parts[0]
            w_cnt = int(parts[3], 16)
            lemmas = [parts[4 + 2 * i] for i in range(w_cnt)]
            i = 4 + 2 * w_cnt
            p_cnt = int(parts[i])
            i += 1
            hyper: list[str] = []
            hypo: list[str] = []
            for _ in range(p_cnt):
                sym, off, _pos, _st = parts[i : i + 4]
                i += 4
                if sym == "@":  # Pointer.HYPERNYM only, not '@i'
                    hyper.append(off)
                elif sym == "~":  # Pointer.HYPONYM only, not '~i'
                    hypo.append(off)
            synsets[offset] = (lemmas, hyper, hypo)
    return synsets


def _parse_index_noun(path: str) -> dict[str, str]:
    """lemma -> first-sense synset offset from a WNDB ``index.noun``
    (offsets trail the line in sense order; sense 1 is listed first)."""
    first: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.startswith("  ") or not line.strip():
                continue
            parts = line.rstrip().split(" ")
            lemma, pos, synset_cnt = parts[0], parts[1], int(parts[2])
            if pos != "n" or synset_cnt < 1:
                continue
            first[lemma] = parts[-synset_cnt]
    return first


def _clean(lemma: str) -> str:
    return lemma.replace("_", " ").replace("-", " ")


def lexicon_rows(index_noun: str, data_noun: str) -> Iterable[tuple[str, str, int]]:
    """Yield distinct (word, related, tier) rows for every noun lemma."""
    synsets = _parse_data_noun(data_noun)
    first = _parse_index_noun(index_noun)
    for lemma, off in sorted(first.items()):
        if off not in synsets:
            continue
        word = lemma.replace("_", " ")
        lemmas, hyper, hypo = synsets[off]
        tiers = [
            (1, {_clean(l) for l in lemmas}),
            (2, {_clean(l) for h in hyper for l in synsets.get(h, ([], 0, 0))[0]}),
            (3, {_clean(l) for h in hypo for l in synsets.get(h, ([], 0, 0))[0]}),
        ]
        for tier, related in tiers:
            for r in sorted(related):
                yield (word, r, tier)


def build_lexicon(
    spark: SparkSession, index_noun: str, data_noun: str
) -> DataFrame:
    """The (word, related, tier) lexicon DataFrame for
    :func:`wordnet.wordnet_label_scores`. WordNet-scale output is ~500k
    rows — created driver-side (the files are read locally anyway) and
    broadcast by the operator at every use."""
    rows = list(lexicon_rows(index_noun, data_noun))
    return spark.createDataFrame(rows, LEXICON_SCHEMA)


def build_lexicon_from_dict_dir(spark: SparkSession, dict_dir: str) -> DataFrame:
    """Convenience wrapper over a WNDB ``dict/`` directory."""
    return build_lexicon(
        spark,
        os.path.join(dict_dir, "index.noun"),
        os.path.join(dict_dir, "data.noun"),
    )
