"""Stage 1 — mention / fact extraction from transcripts.

This replaces the reference's ingest+profile stage (S1-S5:
``IO/ConvertFileToTable.readWebTableForIndexing:743-931`` and friends): where
the reference parses CSV cells into a columnar ``Table``, we parse transcript
turns into a long-format fact/mention table — the Spark-native equivalent of
``model/IndexEntry.java:10-48`` (one row per extracted cell).

Turn grammar (datagen.py is the authoritative co-spec):

* assistant: ``The {pred} of {surface} is {value}.``  → one fact
* tool:      ``entity={surface}; {p}={v}; ...``        → k-1 facts
* user:      ``Tell me about {surface}.``              → one mention

Everything is native Catalyst expressions (regexp_extract / split /
posexplode) — whole-stage codegen, zero Python. Extraction is a narrow map
over the scan: no shuffle, scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mannheimsearchjoinsengine_spark.functions.normalize import norm_key

ASSISTANT_FACT_RE = r"^The ([a-z_]+) of (.+?) is (.+)\.$"
USER_MENTION_RE = r"^(?:Tell me about|What do you know about) (.+?)[.?]$"


def extract_assistant_facts(df: DataFrame) -> DataFrame:
    a = df.filter(F.col("role") == "assistant")
    return (
        a.select(
            "conv_id",
            "turn_idx",
            "ts",
            F.lit("assistant").alias("src"),
            F.regexp_extract("text", ASSISTANT_FACT_RE, 1).alias("pred_raw"),
            F.regexp_extract("text", ASSISTANT_FACT_RE, 2).alias("subj_surface"),
            F.regexp_extract("text", ASSISTANT_FACT_RE, 3).alias("obj_raw"),
        )
        .filter(F.col("pred_raw") != "")
    )


def extract_tool_facts(df: DataFrame) -> DataFrame:
    """Tool-turn facts. The turn's subject is its ``entity=`` pair —
    extracted with an anchored regexp BEFORE the kv explode, so the whole
    extraction is a narrow map over the scan (the earlier window over
    (conv_id, turn_idx) shuffled every exploded kv row; at 2M turns that
    shuffle was the bulk of the extract stage)."""
    t = df.filter(F.col("role") == "tool").withColumn(
        "subj_surface", F.regexp_extract("text", r"(?:^|; )entity=([^;]*)(?:;|$)", 1)
    )
    kv = t.select(
        "conv_id",
        "turn_idx",
        "ts",
        "subj_surface",
        F.explode(F.split("text", "; ")).alias("kv"),
    ).select(
        "conv_id",
        "turn_idx",
        "ts",
        "subj_surface",
        F.split_part(F.col("kv"), F.lit("="), F.lit(1)).alias("k"),
        F.split_part(F.col("kv"), F.lit("="), F.lit(2)).alias("v"),
    )
    return kv.filter(F.col("k") != "entity").select(
        "conv_id",
        "turn_idx",
        "ts",
        F.lit("tool").alias("src"),
        F.col("k").alias("pred_raw"),
        "subj_surface",
        F.col("v").alias("obj_raw"),
    )


def extract_facts(df: DataFrame) -> DataFrame:
    """All (conv_id, turn_idx, src, pred_raw, subj_surface, obj_raw) facts,
    plus normalized subject key (`subj_norm`) used for linking/canonicalization."""
    facts = extract_assistant_facts(df).unionByName(extract_tool_facts(df))
    return facts.withColumn("subj_norm", norm_key(F.col("subj_surface")))


def extract_mentions(df: DataFrame) -> DataFrame:
    """User-turn entity mentions (the query side of the search join)."""
    u = df.filter(F.col("role") == "user")
    return (
        u.select(
            "conv_id",
            "turn_idx",
            "ts",
            F.regexp_extract("text", USER_MENTION_RE, 1).alias("subj_surface"),
        )
        .filter(F.col("subj_surface") != "")
        .withColumn("subj_norm", norm_key(F.col("subj_surface")))
    )
