#!/usr/bin/env bash
# N=1 vs 4N=4 cores at sf32, interleaved A/B min-of-all (same protocol as
# BENCH/run_scaling.sh; lower absolute parallelism keeps the pair below the
# host VM's memory-bandwidth ceiling measured at 8+ threads).
set -euo pipefail
cd /root/repo
SF_DIR=/root/repo/data/scaling/sf32
export SPARK_SHUFFLE_PARTITIONS=64
export SPARK_MAX_PARTITION_BYTES=$((16*1024*1024))
export SPARK_DRIVER_MEM=64g
ROUNDS=2
declare -a R_N R_4N
for round in $(seq 1 "$ROUNDS"); do
  echo "== round $round: local[1] ==" >&2
  R_N[$round]=$(SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=1 \
    SPARK_GRAFT_KG_ONLY=1 SPARK_GRAFT_BENCH_REPS=2 python bench.py | tail -1)
  echo "== round $round: local[4] ==" >&2
  R_4N[$round]=$(SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=4 \
    SPARK_GRAFT_KG_ONLY=1 SPARK_GRAFT_BENCH_REPS=2 python bench.py | tail -1)
done
python - "BENCH/scaling_sf32_1v4.json" "${R_N[@]}" "${R_4N[@]}" <<'PYEOF'
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
    "protocol": f"interleaved A/B local[1]/local[4], {len(reps_n)} timed reps per config, min-of-all",
    "throughput_N": tp_n, "throughput_4N": tp_4n,
    "speedup_N_to_4N": round(tp_4n / tp_n, 3),
    "scaling_efficiency": round((tp_4n / tp_n) / 4.0, 3),
}
with open(out_path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
PYEOF
