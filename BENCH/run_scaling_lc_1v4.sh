#!/usr/bin/env bash
# N=1 vs 4N=4 EXECUTORS at sf32 using local-cluster[n,1,24576] — separate
# executor JVMs with their own heaps and a real RPC boundary, the closest
# in-sandbox model of cluster scale-out (r03 directive #6). Same interleaved
# A/B min-of-all protocol as run_scaling_1v4.sh; per-executor memory is held
# constant (24 GiB) so 4N has 4x the aggregate RAM, exactly like adding
# nodes. Driver needs less heap than the single-JVM runs (data lives in the
# executors): 16g.
set -euo pipefail
cd /root/repo
SF_DIR=/root/repo/data/scaling/sf32
export SPARK_SHUFFLE_PARTITIONS=64
export SPARK_MAX_PARTITION_BYTES=$((16*1024*1024))
export SPARK_DRIVER_MEM=16g
ROUNDS=2
declare -a R_N R_4N
for round in $(seq 1 "$ROUNDS"); do
  echo "== round $round: local-cluster[1,1,24576] ==" >&2
  R_N[$round]=$(SPARK_MASTER='local-cluster[1,1,24576]' \
    SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=1 \
    SPARK_GRAFT_KG_ONLY=1 SPARK_GRAFT_BENCH_REPS=2 python bench.py | tail -1)
  echo "== round $round: local-cluster[4,1,24576] ==" >&2
  R_4N[$round]=$(SPARK_MASTER='local-cluster[4,1,24576]' \
    SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=4 \
    SPARK_GRAFT_KG_ONLY=1 SPARK_GRAFT_BENCH_REPS=2 python bench.py | tail -1)
done
python - "BENCH/scaling_sf32_lc_1v4.json" "${R_N[@]}" "${R_4N[@]}" <<'PYEOF'
import json, sys
out_path = sys.argv[1]
rounds = (len(sys.argv) - 2) // 2
rn = [json.loads(s) for s in sys.argv[2 : 2 + rounds]]
r4 = [json.loads(s) for s in sys.argv[2 + rounds :]]
def best(rs):
    reps = [t for r in rs for t in r["pipeline_reps_s"]]
    wall = min(reps)
    return wall, round(rs[0]["n_turns"] / wall, 1), reps
wall_n, tp_n, reps_n = best(rn)
wall_4n, tp_4n, reps_4n = best(r4)
out = {
    "localN": {**rn[0], "value": wall_n, "turns_per_sec": tp_n,
               "pipeline_reps_s": reps_n, "queries": {"kg_pipeline": wall_n}},
    "local4N": {**r4[0], "value": wall_4n, "turns_per_sec": tp_4n,
                "pipeline_reps_s": reps_4n, "queries": {"kg_pipeline": wall_4n}},
    "protocol": ("interleaved A/B local-cluster[1,1,24576]/local-cluster[4,1,24576]"
                 f", {len(reps_n)} timed reps per config, min-of-all"),
    "throughput_N": tp_n, "throughput_4N": tp_4n,
    "speedup_N_to_4N": round(tp_4n / tp_n, 3),
    "scaling_efficiency": round((tp_4n / tp_n) / 4.0, 3),
}
with open(out_path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
PYEOF
