"""Multimodal columns — opaque binary payloads + typed metadata.

The reference corpus is text-only; a 100 TB training-data pipeline also
carries image/audio/video columns. Pattern: the modality is an opaque
``binary`` column plus a typed metadata struct; decode / feature-extract /
frame-sample run as **Arrow-batched pandas functions over mapInPandas** —
bytes never round-trip through per-row Python, and each batch is one Arrow
buffer.

The actual codec libraries (PIL/ffmpeg/soundfile) are NOT in this
container, so the real decoders are stubbed behind ``NotImplementedError``
(clearly marked below). The *deterministic fake* decode path keeps the
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — real and testable, and has an exact DuckDB oracle.

Scale notes: payload columns dominate bytes → keep them out of every
shuffle. Feature extraction is a narrow ``mapInPandas`` over the scan
(no shuffle); outputs drop the payload column immediately. Partitioning
follows the storage layout (doc_id-ranged files); nothing here repartitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 32  # fake "frame" = 32-byte payload chunk


def decode_image(payload: bytes) -> object:
    """REAL image decode — STUB. The container ships no imaging library;
    on a production cluster this body is ``PIL.Image.open(io.BytesIO(b))``.
    The pipeline never calls it unless a real codec is requested."""
    raise NotImplementedError("image codec not available in this environment")


def decode_audio(payload: bytes) -> object:
    """REAL audio decode — STUB (production: soundfile/librosa)."""
    raise NotImplementedError("audio codec not available in this environment")


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque binary column + typed metadata struct.

    The deterministic fake payload is the UTF-8 encoding of the text column
    (stable across engines → oracle-checkable); a real pipeline reads the
    bytes from object storage instead.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit("fake/utf8").alias("format"),
            F.length(F.col("payload")).alias("n_bytes"),
        ),
    )


def payload_features(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature extraction over the binary column via mapInPandas.

    Deterministic fake features (byte stats + derived fake dimensions);
    swap the body for a real decoder on a cluster with codecs. One Arrow
    batch in, one out; the payload column is dropped on output.
    """
    schema = (
        f"{id_col} long, n_bytes int, first_byte int, last_byte int, "
        "byte_sum long, fake_width int, fake_height int"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.str.len().astype("int32")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n,
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else 0).astype("int32"),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else 0).astype("int32"),
                    "byte_sum": payloads.map(lambda b: sum(b)).astype("int64"),
                    "fake_width": (n % 640).astype("int32"),
                    "fake_height": ((n * 7) % 480).astype("int32"),
                }
            )

    return docs.select(F.col(id_col).cast("long").alias(id_col), "payload").mapInPandas(
        extract, schema
    )


def frame_sample(docs: DataFrame, every_n: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Frame sampling over a video-like payload: keep every ``every_n``-th
    fixed-size chunk, emit per-frame stats. mapInPandas (Arrow batches);
    output is long-format (doc, frame_idx) — never a wide frame pivot."""
    schema = f"{id_col} long, frame_idx int, frame_len int, frame_sum long"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf["payload"]):
                for fi in range(0, (len(b) + FRAME_BYTES - 1) // FRAME_BYTES, every_n):
                    chunk = b[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(fi)
                    lens.append(len(chunk))
                    sums.append(sum(chunk))
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_len": pd.Series(lens, dtype="int32"),
                 "frame_sum": pd.Series(sums, dtype="int64")}
            )

    return docs.select(F.col(id_col).cast("long").alias(id_col), "payload").mapInPandas(
        sample, schema
    )
