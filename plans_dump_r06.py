#!/usr/bin/env python
"""Dump .explain('formatted') for the round-6 target queries into
plans/r06/<query>_<tag>.txt (tag = before/after). Not part of the driver
contract; measurement stays in bench.py / bench_extra.py."""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")

TARGETS = [
    "kg_probe_topk",
    "kg_join_results",
    "kg_resolve_voting",
    "kg_infogather_tsp",
    "doc_minhash_lsh",
    "doc_ngram_jaccard_top",
    "doc_dup_clusters",
    "doc_simhash_pairs",
    "emb_cosine_topk",
    "emb_near_dup",
    "tpch_pricing_summary",
]


def main() -> None:
    from mannheimsearchjoinsengine_spark.driver_contract import build_contract
    from mannheimsearchjoinsengine_spark.session import get_spark

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="plans-r06")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = build_contract(SF_DIR)
    for name in TARGETS:
        if ONLY and name not in ONLY:
            continue
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{TAG}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
