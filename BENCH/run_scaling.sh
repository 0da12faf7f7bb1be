#!/usr/bin/env bash
# Two-cluster-size scaling evidence (sandbox proxy for N vs 4N executors):
# run the identical KG pipeline at local[2] and local[8] on the same input
# and report throughput at both plus scaling efficiency (BASELINE.md
# protocol). Scaling runs at sf8 (8M synthesized turns) so that compute
# dominates the per-job scheduling floor — at sf0.1 (100k turns) the
# pipeline is fixed-cost-bound and no core count helps.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/repo/data/scaling/sf8}"
mkdir -p "$SF_DIR"
OUT="BENCH/scaling_$(basename "$SF_DIR").json"

echo "== local[2] ==" >&2
R8=$(SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=2 SPARK_GRAFT_KG_ONLY=1 SPARK_GRAFT_BENCH_REPS=3 python bench.py | tail -1)
echo "== local[8] ==" >&2
R32=$(SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=8 SPARK_GRAFT_KG_ONLY=1 SPARK_GRAFT_BENCH_REPS=3 python bench.py | tail -1)

python - "$R8" "$R32" "$OUT" <<'EOF'
import json, sys
r8, r32 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4.0
out = {
    "localN": r8, "local4N": r32,
    "throughput_N": r8["turns_per_sec"], "throughput_4N": r32["turns_per_sec"],
    "speedup_N_to_4N": round(r32["turns_per_sec"] / r8["turns_per_sec"], 3),
    "scaling_efficiency": round(eff, 3),
}
with open(sys.argv[3], "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
EOF
