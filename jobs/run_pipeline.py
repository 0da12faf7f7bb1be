#!/usr/bin/env python
"""spark-submit entry point for the KG-construction pipeline.

Cluster run (the north-rule deployment shape):

    cd /root/repo && zip -qr /tmp/sjspark.zip mannheimsearchjoinsengine_spark
    spark-submit --master <cluster> --py-files /tmp/sjspark.zip \
        jobs/run_pipeline.py --sf-dir <input> --checkpoint-root <ckpt> \
        [--fuzzy-canonical] [--output <dir>]

The session builder only sets SQL confs (AQE, Arrow, splits); master and
executor topology come from spark-submit. With --checkpoint-root every
stage materializes through the ledger: kill the job at any stage boundary
and a re-run resumes from the last completed stage with identical output
(per-partition lineage rows land under <ckpt>/_lineage/).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--checkpoint-root", default=None)
    ap.add_argument("--output", default=None, help="optional triple-table parquet dir")
    ap.add_argument("--fuzzy-canonical", action="store_true")
    src = ap.add_mutually_exclusive_group()
    src.add_argument(
        "--input-path",
        default=None,
        help="read transcripts from this parquet/csv(.gz)/json path instead "
        "of the sf-dir's synthesized parquet",
    )
    src.add_argument(
        "--input-table",
        default=None,
        help="read transcripts from this catalog table identifier "
        "(e.g. kg.db.transcripts on an Iceberg catalog)",
    )
    ap.add_argument(
        "--input-format",
        default=None,
        choices=["parquet", "csv", "json"],
        help="override the extension-inferred format of --input-path",
    )
    ap.add_argument(
        "--output-table",
        default=None,
        help="also materialize the triple table to this catalog table "
        "identifier (writeTo createOrReplace, partitioned by subj_bucket)",
    )
    ap.add_argument(
        "--output-table-format",
        default="parquet",
        help="table provider for --output-table (iceberg on a cluster "
        "with the runtime jar; parquet against spark_catalog)",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from mannheimsearchjoinsengine_spark.plans.pipeline import run_pipeline

    # spark-submit provides master/deploy confs; only attach app-level SQL
    # confs here (idempotent when the session already exists).
    spark = SparkSession.builder.appName("sjspark-kg-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    result = run_pipeline(
        spark,
        args.sf_dir,
        checkpoint_root=args.checkpoint_root,
        fuzzy_canonical=args.fuzzy_canonical,
        input_path=args.input_path,
        input_format=args.input_format,
        input_table=args.input_table,
    )
    triples = result["triples"]
    if args.output:
        triples.write.mode("overwrite").partitionBy("subj_bucket").parquet(args.output)
    if args.output_table:
        from mannheimsearchjoinsengine_spark.sources.catalog import write_table

        write_table(triples, args.output_table, args.output_table_format)
    n = triples.count()
    print(
        json.dumps(
            {
                "triples": n,
                "wall_s": round(time.time() - t0, 3),
                "sf_dir": args.sf_dir,
                "resumable": args.checkpoint_root is not None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
