"""Explicit skew salting (north-rule axis: partitioning/shuffle/skew).

The reference's only skew answer was a backpressure sleep loop
(``searchjoin/SearchJoin.java:397-410``). Here, three defense layers:

1. **Map-side partial aggregation** — every per-conv/per-label groupBy
   emits one partial row per input partition for a hot key, so the
   5000-turn monster conversation and the 20%-frequency hot entities never
   form a hot shuffle partition (free in Spark, see PLANS.md).
2. **AQE skew-join splitting** — on for every session (session.py).
3. **Explicit salting** (this module) — for the one shape the first two
   don't cover: an equi-join whose build side is too big to broadcast AND
   whose probe-side key histogram is skewed (e.g. the token probe when the
   query table is itself web-scale). The hot-key rows are split across
   ``n_salts`` synthetic sub-keys; the other side is replicated onto every
   salt. Deterministic (xxhash64 of the row's own columns — no RNG, per
   the repo's determinism discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_salt(df: DataFrame, n_salts: int, *cols: str) -> DataFrame:
    """Deterministic salt in [0, n_salts) from the row's own columns
    (defaults to all columns). Same row → same salt across reruns."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("salt", F.pmod(F.xxhash64(*basis), F.lit(n_salts)))


def explode_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate every row onto all salts (the small/replicated side of a
    salted join)."""
    return df.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )


def salted_equi_join(
    skewed: DataFrame,
    replicated: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s key histogram has hot keys and
    ``replicated`` is too big to broadcast but small enough to ×n_salts.

    skewed rows scatter across n_salts sub-partitions per key;
    replicated rows are cloned onto every salt → the hot key's work is
    spread over n_salts reducers instead of one.
    """
    l = add_salt(skewed, n_salts)
    r = explode_salts(replicated, n_salts)
    return l.join(r, on + ["salt"], how).drop("salt")
