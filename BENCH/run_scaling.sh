#!/usr/bin/env bash
# Two-cluster-size scaling evidence (sandbox proxy for N vs 4N executors):
# run the identical KG pipeline at local[2] and local[8] on the same input
# and report throughput at both plus scaling efficiency (BASELINE.md
# protocol). Scaling runs at sf8 (8M synthesized turns) so that compute
# dominates the per-job scheduling floor — at sf0.1 (100k turns) the
# pipeline is fixed-cost-bound and no core count helps.
#
# Noise protocol: host noise drifts on multi-minute timescales (identical
# warm runs vary 2-8x), so the N and 4N configs are INTERLEAVED
# (A/B A/B A/B) instead of run as two back-to-back blocks — a slow phase
# hits both configs, not just one. Each bench.py invocation is a fresh JVM
# with its own untimed warm-up + $REPS_PER_ROUND timed reps; the final
# number per config is the min over all rounds × reps (6 timed reps each).
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/repo/data/scaling/sf8}"
mkdir -p "$SF_DIR"
OUT="BENCH/scaling_$(basename "$SF_DIR").json"
ROUNDS="${SPARK_GRAFT_SCALING_ROUNDS:-3}"
REPS_PER_ROUND="${SPARK_GRAFT_SCALING_REPS:-2}"
# one data-sized shuffle-partition count for BOTH parallelism levels (a
# cluster job sizes partitions by input, not executor count); 8 partitions
# at 32M turns spills every big sort — see session.py comment
export SPARK_SHUFFLE_PARTITIONS="${SPARK_SHUFFLE_PARTITIONS:-64}"

declare -a R_N R_4N
for round in $(seq 1 "$ROUNDS"); do
  echo "== round $round: local[2] ==" >&2
  R_N[$round]=$(SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=2 \
    SPARK_GRAFT_KG_ONLY=1 SPARK_GRAFT_BENCH_REPS="$REPS_PER_ROUND" \
    python bench.py | tail -1)
  echo "== round $round: local[8] ==" >&2
  R_4N[$round]=$(SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=8 \
    SPARK_GRAFT_KG_ONLY=1 SPARK_GRAFT_BENCH_REPS="$REPS_PER_ROUND" \
    python bench.py | tail -1)
done

python - "$OUT" "${R_N[@]}" "${R_4N[@]}" <<'EOF'
import json, sys
out_path = sys.argv[1]
rounds = (len(sys.argv) - 2) // 2
rn = [json.loads(s) for s in sys.argv[2 : 2 + rounds]]
r4 = [json.loads(s) for s in sys.argv[2 + rounds :]]

def best(rs):
    reps = [t for r in rs for t in r["pipeline_reps_s"]]
    wall = min(reps)
    n_turns = rs[0]["n_turns"]
    return wall, round(n_turns / wall, 1), reps

wall_n, tp_n, reps_n = best(rn)
wall_4n, tp_4n, reps_4n = best(r4)
eff = (tp_4n / tp_n) / 4.0
out = {
    "localN": {**rn[0], "value": wall_n, "turns_per_sec": tp_n,
               "pipeline_reps_s": reps_n, "queries": {"kg_pipeline": wall_n}},
    "local4N": {**r4[0], "value": wall_4n, "turns_per_sec": tp_4n,
                "pipeline_reps_s": reps_4n, "queries": {"kg_pipeline": wall_4n}},
    "protocol": f"interleaved A/B, {len(reps_n)} timed reps per config, min-of-all",
    "throughput_N": tp_n, "throughput_4N": tp_4n,
    "speedup_N_to_4N": round(tp_4n / tp_n, 3),
    "scaling_efficiency": round(eff, 3),
}
with open(out_path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
EOF
