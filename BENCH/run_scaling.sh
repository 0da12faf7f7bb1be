#!/usr/bin/env bash
# Two-cluster-size scaling evidence (sandbox proxy for N vs 4N executors):
# run the identical bench at local[8] and local[32] on the same input and
# report throughput at both plus scaling efficiency (BASELINE.md protocol).
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
OUT="BENCH/scaling_$(basename "$SF_DIR").json"

echo "== local[8] ==" >&2
R8=$(SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=8 python bench.py | tail -1)
echo "== local[32] ==" >&2
R32=$(SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 python bench.py | tail -1)

python - "$R8" "$R32" "$OUT" <<'EOF'
import json, sys
r8, r32 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4.0
out = {
    "local8": r8, "local32": r32,
    "throughput_8": r8["turns_per_sec"], "throughput_32": r32["turns_per_sec"],
    "speedup_8_to_32": round(r32["turns_per_sec"] / r8["turns_per_sec"], 3),
    "scaling_efficiency": round(eff, 3),
}
with open(sys.argv[3], "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
EOF
