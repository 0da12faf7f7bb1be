"""Broadcast-join gating (north-rule axis: partitioning/shuffle at scale).

A hard-coded ``F.broadcast(...)`` hint forces a broadcast Spark's own
planner would refuse once the hinted side outgrows
``spark.sql.autoBroadcastJoinThreshold`` — at a web-scale mention-label set
that hint OOMs the driver. Every pipeline broadcast is therefore gated on a
*measured row count* of the small side (free driver-side metadata: the
stage ledger records per-stage row totals from parquet footers,
``sources/catalog.py``) against the session's threshold; above it the plan
falls through to the equivalence-tested salted shuffle join
(``functions/salting.py``), and below it the broadcast hint is safe by
construction.

The reference never faced this choice — its probe loop was a single-node
Lucene index (``index/IndexManager.searchIndex:290-458``); the gate is the
Spark-native translation of "the index must fit somewhere".
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# conservative average width of a (label, counter) row once serialized into
# a broadcast hash relation (normalized labels are short; hash-table
# overhead dominates)
BYTES_PER_ROW = 64

_SUFFIXES = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def broadcast_threshold_bytes(spark: SparkSession) -> int:
    """``spark.sql.autoBroadcastJoinThreshold`` in bytes (-1 = disabled),
    accepting Spark's byte-suffix grammar ("10MB", "10485760b", "-1")."""
    raw = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    if raw.endswith("b"):
        raw = raw[:-1]
    mult = 1
    if raw and raw[-1] in _SUFFIXES:
        mult = _SUFFIXES[raw[-1]]
        raw = raw[:-1]
    try:
        return int(float(raw) * mult)
    except ValueError:
        return 10 * (1 << 20)


def fits_broadcast(
    spark: SparkSession, n_rows: int | None, bytes_per_row: int = BYTES_PER_ROW
) -> bool:
    """True iff a relation of ``n_rows`` (an exact count or a safe UPPER
    bound) fits under the session broadcast threshold. ``None`` (no
    measurement available) is treated as does-not-fit — the shuffle path is
    always correct; the broadcast path is only an optimization."""
    if n_rows is None:
        return False
    thr = broadcast_threshold_bytes(spark)
    return thr > 0 and n_rows * bytes_per_row <= thr
