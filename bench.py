#!/usr/bin/env python
"""Benchmark harness — one JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

* ``kg_pipeline``  — the flagship end-to-end KG construction
  (extract → index → search join → consolidate → resolve → canonicalize →
  triplify) over the synthesized transcript table at this scale.
  The headline ``value`` metric is its wall-clock; ``turns_per_sec`` is in
  the extras.
* per-operator headliners: probe, join-results, minhash dedup, n-gram
  jaccard, ANN top-k, pricing summary.

Scaling evidence (two-cluster-size proxy) is produced by
``BENCH/run_scaling.sh`` which invokes this file at local[8] and local[32].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# KG_ONLY=1: time only the transcript pipeline (used by the scaling evidence
# at synthesized scales like sf2 = 2M turns, where no TPC-H testdata exists)
KG_ONLY = os.environ.get("SPARK_GRAFT_KG_ONLY", "0") == "1"


def main() -> None:
    from mannheimsearchjoinsengine_spark.datagen import sf_tag_of_dir, turns_for_tag
    from mannheimsearchjoinsengine_spark.driver_contract import build_contract
    from mannheimsearchjoinsengine_spark.plans.pipeline import run_pipeline
    from mannheimsearchjoinsengine_spark.session import get_spark

    spark = get_spark(app_name="sjspark-bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    queries, _ = build_contract(SF_DIR)
    timings: dict[str, float] = {}

    # The sandbox host's transient noise (observed 2-8x for minutes at a
    # stretch) dominates single-shot per-operator numbers and survived
    # min-of-2 in round 3 (two apparent regressions refuted by min-of-4
    # re-measurement); min-of-3 after one untimed warm-up is the cheapest
    # protocol that has matched the careful re-measurements.
    op_reps = max(1, int(os.environ.get("SPARK_GRAFT_OP_REPS", "3")))

    def timed(name: str, fn) -> None:
        # one untimed warm-up (codegen JIT + shuffle-file cache), then
        # min-of-n timed runs
        fn()
        best, n = None, 0
        for _ in range(op_reps):
            t0 = time.time()
            n = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr, flush=True)

    # warm the JVM + generate transcripts outside the timed region
    n_turns = turns_for_tag(sf_tag_of_dir(SF_DIR))
    queries["kg_turns"](spark, SF_DIR).count()
    reps = []
    # Stage boundaries go through the parquet LEDGER (a fresh checkpoint
    # root per rep, wiped afterwards) — the production/resume path the
    # north rule mandates. The localCheckpoint fallback stores stage
    # outputs as DESERIALIZED on-heap row objects, whose GC cost grows
    # superlinearly with input (measured: sf32 cells stage 94µs/row vs
    # ≤10µs/row at sf8; the ledger path runs sf32 end-to-end in ~150 s
    # where the localCheckpoint path took >25 min).
    import gc
    import shutil
    import tempfile

    def timed_pipeline():
        root = tempfile.mkdtemp(prefix="bench_ckpt_")
        try:
            t0 = time.time()
            triples = run_pipeline(spark, SF_DIR, checkpoint_root=root)["triples"]
            n = triples.count()
            return round(time.time() - t0, 3), n
        finally:
            shutil.rmtree(root, ignore_errors=True)

    # Steady-state throughput: one untimed warm-up run amortizes
    # whole-stage-codegen JIT compilation (worth 30-60 s on the first
    # pipeline executions in a fresh JVM, at any core count).
    timed_pipeline()
    gc.collect()
    # The sandbox host has transient background load (observed 73-222 s for
    # identical warm runs), so scaling-evidence mode takes the MIN of three
    # timed reps — the interference-free estimate.
    # full-bench pipeline default is min-of-2: the single-rep headline
    # swung 13-25 s across same-code runs (host noise), and one extra rep
    # is the cheapest insurance for the round-over-round comparison
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3" if KG_ONLY else "2"))

    n_triples = 0
    for i in range(n_reps):
        rep_s, n_triples = timed_pipeline()
        reps.append(rep_s)
        print(f"# kg_pipeline rep{i}: {reps[-1]}s ({n_triples} triples)",
              file=sys.stderr, flush=True)
        if n_reps > 1:
            gc.collect()
    pipeline_s = min(reps)
    timings["kg_pipeline"] = pipeline_s

    if not KG_ONLY:
        for name in (
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
        ):
            timed(name, lambda name=name: queries[name](spark, SF_DIR).count())

    out = {
        "metric": "kg_pipeline_wall_clock",
        "value": pipeline_s,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": CPUS,
        "n_turns": n_turns,
        "n_triples": n_triples,
        "turns_per_sec": round(n_turns / pipeline_s, 1),
        "pipeline_reps_s": reps,
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
