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
        # fully vectorized inside the Arrow batch: one concatenated byte
        # buffer + numpy reduceat for per-doc sums — no per-element Python
        # (sum(b) per payload was the old per-row hot spot)
        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.str.len().fillna(0).astype("int64").to_numpy()
            blob = (
                np.frombuffer(b"".join(payloads.tolist()), dtype=np.uint8)
                if len(payloads)
                else np.zeros(0, np.uint8)
            )
            offs = np.zeros(len(n), dtype=np.int64)
            if len(n) > 1:
                np.cumsum(n[:-1], out=offs[1:])
            nz = n > 0
            first = np.zeros(len(n), np.int32)
            last = np.zeros(len(n), np.int32)
            sums = np.zeros(len(n), np.int64)
            if blob.size:
                first[nz] = blob[offs[nz]]
                last[nz] = blob[offs[nz] + n[nz] - 1]
                # reduceat over nonzero starts: empty docs span zero bytes,
                # so each segment holds exactly one doc's bytes
                sums[nz] = np.add.reduceat(blob.astype(np.int64), offs[nz])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": pd.Series(n.astype("int32")),
                    "first_byte": pd.Series(first),
                    "last_byte": pd.Series(last),
                    "byte_sum": pd.Series(sums),
                    "fake_width": pd.Series((n % 640).astype("int32")),
                    "fake_height": pd.Series(((n * 7) % 480).astype("int32")),
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
        # vectorized frame enumeration: per-doc sampled-frame counts →
        # repeat/arange index algebra → one interleaved reduceat for all
        # frame sums (no per-frame Python loop)
        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.str.len().fillna(0).astype("int64").to_numpy()
            blob = (
                np.frombuffer(b"".join(payloads.tolist()), dtype=np.uint8)
                if len(payloads)
                else np.zeros(0, np.uint8)
            )
            offs = np.zeros(len(n), dtype=np.int64)
            if len(n) > 1:
                np.cumsum(n[:-1], out=offs[1:])
            n_frames = -(-n // FRAME_BYTES)  # ceil
            n_sampled = -(-n_frames // every_n)
            doc_pos = np.repeat(np.arange(len(n)), n_sampled)
            total = int(n_sampled.sum())
            # rank within each doc's sampled frames: 0,1,2,... per group
            grp_start = np.zeros(len(n), dtype=np.int64)
            if len(n) > 1:
                np.cumsum(n_sampled[:-1], out=grp_start[1:])
            rank = np.arange(total, dtype=np.int64) - grp_start[doc_pos]
            frame_idx = rank * every_n
            starts = offs[doc_pos] + frame_idx * FRAME_BYTES
            lens = np.minimum(FRAME_BYTES, n[doc_pos] - frame_idx * FRAME_BYTES)
            sums = np.zeros(total, dtype=np.int64)
            if total and blob.size:
                # interleaved [start, end) pairs; pad blob so an end ==
                # len(blob) stays a valid reduceat index
                padded = np.concatenate([blob.astype(np.int64), [0]])
                bounds = np.empty(2 * total, dtype=np.int64)
                bounds[0::2] = starts
                bounds[1::2] = starts + lens
                sums = np.add.reduceat(padded, bounds)[0::2]
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy()[doc_pos],
                 "frame_idx": pd.Series(frame_idx.astype("int32")),
                 "frame_len": pd.Series(lens.astype("int32")),
                 "frame_sum": pd.Series(sums)}
            )

    return docs.select(F.col(id_col).cast("long").alias(id_col), "payload").mapInPandas(
        sample, schema
    )
