"""Structured Streaming exact dedup over a continuously-landing corpus.

Batch exact dedup (`operators/dedup.exact_dedup`) answers "group the whole
corpus by fingerprint"; an ingest pipeline needs the ONLINE form — emit a
document once, suppress re-arrivals — without re-scanning the corpus per
micro-batch. Spark-native, that is `dropDuplicatesWithinWatermark` over the
normalized-text fingerprint: the state store keeps one entry per fingerprint
seen within the watermark horizon and expires it afterwards, so state is
bounded by (ingest rate × watermark), not corpus size.

Semantics vs batch (stated, not hidden): the streaming keeper is the
FIRST-ARRIVED document per fingerprint (arrival order), while batch
`exact_dedup` elects min(doc_id); the kept fingerprint SET is identical
(parity-tested), the keeper id is not guaranteed to match. A re-arrival
AFTER the watermark expires its fingerprint is emitted again — the horizon
is the dedup guarantee, sized by how long a duplicate burst can straddle
(crawl re-fetch windows), exactly the tradeoff every streaming deduper at
scale makes (exact global dedup needs the batch operator over the
compacted corpus, which this module does not replace).

100 TB shape: the fingerprint is a fixed-width digest (no text retained in
state), state is hash-partitioned by fingerprint across executors, and the
watermark bounds per-executor state growth; the sink append is idempotent
per epoch through the checkpoint, same as extract_stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mannheimsearchjoinsengine_spark.functions.text import fingerprint


def document_stream(
    spark: SparkSession, docs_path: str, max_files: int = 4
) -> DataFrame:
    """File-source stream over a documents LANDING DIRECTORY (file sources
    stream directories, not single files — new parquet files are discovered
    incrementally as the crawler drops them); schema is read once from the
    existing files (streaming file sources require an explicit schema)."""
    schema = spark.read.parquet(docs_path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(docs_path)
    )


def streaming_exact_dedup(
    doc_stream: DataFrame,
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival exact dedup: one output row per normalized-text
    fingerprint within the watermark horizon. Returns the surviving
    document rows plus their ``fp`` column.

    ``ingest_ts`` is processing time: the documents table carries no event
    time, and the dedup horizon is about ARRIVAL (when a crawler re-fetch
    can land), so processing time is the semantically right clock here —
    with the bonus that it is monotone, so no row is dropped as late.
    """
    return (
        doc_stream.withColumn("fp", fingerprint(F.col(text_col)))
        .withColumn("ingest_ts", F.current_timestamp())
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .drop("ingest_ts")
    )


def run_streaming_dedup(
    spark: SparkSession,
    docs_path: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
) -> None:
    """Drain the current backlog through the dedup (trigger availableNow),
    appending survivors to ``out_dir``; resumable via ``checkpoint_dir``
    like every sink in this package. Dedup is purely by the text
    fingerprint — there is deliberately no id parameter (the keeper is the
    first-arrived row, whatever its id; ADVICE r05)."""
    deduped = streaming_exact_dedup(document_stream(spark, docs_path), text_col)
    (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
