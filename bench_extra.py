#!/usr/bin/env python
"""Round-6 auxiliary benchmarks (bench.py is FROZEN for measurement; every
number cited in OPTIMIZATION_r06.md that is not a bench.py run comes from
here).

Differences from bench.py:
* noop-sink isolation (guide §1.4): each query is materialized with
  ``df.write.format("noop")`` so the timing covers every column of every
  row, not a count() the optimizer can prune.
* canary framing: ``tpch_pricing_summary`` (constant-cost, untouched since
  r04) is timed FIRST and LAST; its committed floor is ~0.17 s at sf0.1 on
  this host, and a run whose canary reads far above the floor is a
  host-noise phase — compare ratios, not absolutes (the r05 verdict's #1
  judging hazard).

Usage: SPARK_GRAFT_SF_DIR=... python bench_extra.py [query,query,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_OP_REPS", "3"))
CANARY = "tpch_pricing_summary"
DEFAULT = [
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
]


def main() -> None:
    from mannheimsearchjoinsengine_spark.driver_contract import build_contract
    from mannheimsearchjoinsengine_spark.session import get_spark

    names = sys.argv[1].split(",") if len(sys.argv) > 1 else DEFAULT
    spark = get_spark(app_name="sjspark-bench-extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = build_contract(SF_DIR)
    queries["kg_turns"](spark, SF_DIR).count()  # JVM warm

    def timed(name: str) -> float:
        spark.sparkContext.setJobDescription(f"bench-extra:{name}")
        fn = lambda: queries[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        fn()  # warm-up (codegen JIT)
        best = None
        for _ in range(REPS):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"# {name}: {best:.3f}s", file=sys.stderr, flush=True)
        return round(best, 3)

    out = {"canary_first": timed(CANARY)}
    out["queries"] = {n: timed(n) for n in names}
    out["canary_last"] = timed(CANARY)
    out.update({"sf": SF_DIR, "cpus": CPUS, "reps": REPS, "unit": "sec"})
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
