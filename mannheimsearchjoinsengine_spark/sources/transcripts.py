"""Transcript source (the engine's S1-S5 analog input).

The reference ingests CSV/gz web tables (``IO/ConvertFileToTable.java``);
our input is the north-rule transcript table. At 10^12-turn scale this is an
Iceberg table bucketed by ``conv_id``; in the sandbox it is the deterministic
parquet produced by :mod:`mannheimsearchjoinsengine_spark.datagen`.

Scale notes: the parquet/Iceberg scan is already split by file/row-group, so
extraction is a narrow map — no shuffle. A single monster conversation (the
skew case in FIXTURES.md) only matters to per-``conv_id`` aggregations; those
operators salt internally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mannheimsearchjoinsengine_spark.datagen import ensure_transcripts

TPCH_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load (generating if needed) the transcript table for a testdata dir."""
    return spark.read.parquet(ensure_transcripts(sf_dir))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver-provided parquet tables."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
